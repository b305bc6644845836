package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntervalOverlapSpec extends SparkSpec {
  import spark.implicits._

  test("bucket decomposition is exact: same pairs as the direct theta join") {
    val bucketUs = 10L // tiny buckets so intervals span many of them
    val iv = Seq(
      // (user, session, t0, t1) — overlaps across users, multi-bucket spans
      (1L, 1L, 0L, 35L), (1L, 2L, 50L, 55L),
      (2L, 1L, 30L, 60L), (2L, 2L, 90L, 95L),
      (3L, 1L, 33L, 34L), (3L, 2L, 200L, 300L)
    ).toDF("user_id", "session_id", "t0", "t1")

    val bucketed = iv.withColumn("bucket",
      explode(sequence(expr(s"t0 div $bucketUs"), expr(s"t1 div $bucketUs"))))
    val a = bucketed.select(col("bucket"), col("user_id").as("a_user"),
      col("session_id").as("a_session"), col("t0").as("a_t0"), col("t1").as("a_t1"))
    val b = bucketed.select(col("bucket"), col("user_id").as("b_user"),
      col("session_id").as("b_session"), col("t0").as("b_t0"), col("t1").as("b_t1"))
    val viaBuckets = a.join(b, Seq("bucket"))
      .filter(col("a_user") < col("b_user"))
      .filter(col("a_t0") <= col("b_t1") && col("b_t0") <= col("a_t1"))
      .filter(expr(s"bucket = (greatest(a_t0, b_t0) div $bucketUs)"))
      .select("a_user", "a_session", "b_user", "b_session")
      .as[(Long, Long, Long, Long)].collect()

    val direct = iv.toDF("a_user", "a_session", "a_t0", "a_t1")
      .crossJoin(iv.toDF("b_user", "b_session", "b_t0", "b_t1"))
      .filter(col("a_user") < col("b_user"))
      .filter(col("a_t0") <= col("b_t1") && col("b_t0") <= col("a_t1"))
      .select("a_user", "a_session", "b_user", "b_session")
      .as[(Long, Long, Long, Long)].collect()

    // exactly once per pair: the arithmetic dedup (later-start bucket) must
    // neither drop nor duplicate
    assert(viaBuckets.length === viaBuckets.toSet.size)
    assert(viaBuckets.toSet === direct.toSet)
    assert(direct.nonEmpty)
  }

  test("driver query yields concurrent cross-user sessions at sf0.001") {
    val rows = Joins.j08IntervalOverlap(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("overlap_us") >= 0L))
  }
}
