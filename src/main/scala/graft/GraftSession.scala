package graft

import org.apache.spark.sql.SparkSession

/** Canonical session factory: the configuration every entry point (Verify,
  * Bench, tests) shares. Local-mode sizing maps 1:1 to cluster settings —
  * `shuffle.partitions` ≈ total cores; AQE coalesces/replans at runtime so
  * the same code scales from local[4] to a 1000-executor cluster. */
object GraftSession {
  def apply(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
            cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet stores TIMESTAMP(NANOS); read as Long and convert
      // (Tables.events) to µs timestamps by truncation.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
