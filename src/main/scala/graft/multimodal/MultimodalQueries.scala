package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-visible multimodal queries. mm1 has no SQL oracle (mapPartitions
  * byte-level featurization isn't SQL-expressible) → rows-only at the
  * driver, semantics pinned by MultimodalSpec (determinism, partition
  * invariance, batch shape). mm2 touches no bytes at all — frame sampling
  * is integer metadata math — so it IS oracle-gated. */
object MultimodalQueries {

  /** mm1: batched featurization over the synthetic binary media table —
    * per doc: media type, byte count, and the dominant histogram bin. */
  def mm1MediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Multimodal.featurize(Multimodal.syntheticMedia(spark, dir))
      .map { f =>
        val dom = f.histogram.zipWithIndex.maxBy { case (v, i) => (v, -i) }
        (f.doc_id, f.media_type, f.n_bytes, dom._2, dom._1.toDouble)
      }
      .toDF("doc_id", "media_type", "n_bytes", "dominant_bin", "dominant_frac")
      .orderBy("doc_id")
  }

  /** mm2: deterministic frame sampling of the video rows. */
  def mm2FrameSample(spark: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(Multimodal.syntheticMedia(spark, dir), stepMs = 5000)
      .toDF().orderBy("doc_id", "frame_idx")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm1_media_features" -> (mm1MediaFeatures _),
    "mm2_frame_sample" -> (mm2FrameSample _)
  )

  /** mm2's SQL twin: video rows are `doc_id % 3 = 2`, duration is
    * `n_chars * 40` ms, frames every 5000 ms within [0, duration) —
    * `sequence(0, d-1, 5000)` has ⌊(d-1)/5000⌋ + 1 elements. */
  def oracle: Map[String, String] = Map(
    "mm2_frame_sample" ->
      """WITH v AS (
        |  SELECT doc_id, unnest(range(0, (n_chars * 40 - 1) // 5000 + 1)) AS k
        |  FROM documents WHERE doc_id % 3 = 2 AND n_chars * 40 > 0)
        |SELECT doc_id, CAST(k AS INT) AS frame_idx,
        |  CAST(k * 5000 AS BIGINT) AS offset_ms
        |FROM v ORDER BY doc_id, frame_idx""".stripMargin
  )
}
