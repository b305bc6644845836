package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-visible multimodal queries. No SQL oracle (mapPartitions
  * featurization isn't SQL-expressible) → the driver records rows-only
  * checks; the semantics are pinned by MultimodalSpec (determinism,
  * partition invariance, batch shape). */
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
}
