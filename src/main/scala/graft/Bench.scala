package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession() // one shared config for Verify/Bench/tests
    // Warmup: run every query once at the smallest SF so whole-stage
    // codegen compilation and JIT happen outside the timed region — the
    // timed numbers then measure dataflow, not first-touch compilation.
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory)
      SparkEntry.queries.values.foreach { fn =>
        try fn(spark, warmDir).count() catch { case _: Throwable => }
      }
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    // A throwing query must surface as a failure, not masquerade as its
    // wall time: failed queries report -1 in `queries`, are excluded from
    // `value`, and are listed by name under `failed`.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      graft.util.Caches.releaseAll()
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val qs = results.map { case (k, v, ok) => s"\"" + k + "\":" + (if (ok) v else -1.0) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","failed":$failed}"""
    println(json)
    // stdout capture of a long sbt run can truncate (BENCH_r03 lost its
    // head); the file copy is the durable record
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"bench_out write failed: $e") }
    spark.stop()
  }
}
