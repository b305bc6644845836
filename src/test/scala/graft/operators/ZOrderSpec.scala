package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  def z(x: Long, y: Long): Long =
    Seq((x, y)).toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y"))).as[Long].collect().head

  test("the curve visits the plane in Morton order") {
    assert(z(0, 0) === 0L && z(1, 0) === 1L && z(0, 1) === 2L && z(1, 1) === 3L)
    assert(z(2, 0) === 4L && z(0, 2) === 8L && z(3, 3) === 15L)
    assert(z(65535, 65535) === (1L << 32) - 1)
  }

  test("interleaving is a bijection: deinterleave recovers both keys") {
    def unz(v: Long): (Long, Long) = {
      var (x, y) = (0L, 0L)
      for (j <- 0 until 16) {
        x |= ((v >> (2 * j)) & 1L) << j
        y |= ((v >> (2 * j + 1)) & 1L) << j
      }
      (x, y)
    }
    val pts = for (x <- Seq(0L, 1L, 7L, 255L, 1999L, 65535L);
                   y <- Seq(0L, 1L, 9L, 99L, 65535L)) yield (x, y)
    val zs = pts.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zValue(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
    zs.foreach { case (x, y, v) => assert(unz(v) === ((x, y)), s"($x,$y)") }
    assert(zs.map(_._3).distinct.length === pts.length)
  }

  test("z buckets bound BOTH dimensions tighter than a 1-D sort does") {
    val boxes = ZOrder.zorderCluster(spark, sf001).collect()
    assert(boxes.length > 8)
    val li = graft.Tables.lineitem(spark, sf001)
      .agg(min("l_suppkey"), max("l_suppkey")).as[(Long, Long)].collect().head
    val fullY = (li._2 - li._1).toDouble
    // under an x-sorted layout every file's y-spread is the full y range;
    // under z-order the average bucket must confine y substantially
    val avgY = boxes.map(r => (r.getAs[Long]("y_max") - r.getAs[Long]("y_min")).toDouble)
      .sum / boxes.length
    assert(avgY < fullY * 0.75, s"avg y-spread $avgY vs full $fullY")
  }
}
