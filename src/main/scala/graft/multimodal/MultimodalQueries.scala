package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-visible multimodal queries. mm1's histogram half has no SQL
  * oracle (mapPartitions byte-level featurization isn't SQL-expressible) →
  * rows-only at the driver, semantics pinned by MultimodalSpec
  * (determinism, partition invariance, batch shape). mm1b splits out the
  * metadata half — media type, UTF-8 byte count, dimensions, duration —
  * which IS pure metadata math and therefore oracle-gated, shrinking the
  * stub surface to the honest codec-only residue. mm2 touches no bytes at
  * all — frame sampling is integer metadata math — so it IS oracle-gated. */
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

  /** mm1b: the metadata columns of the media pipeline, routed through the
    * SAME `mapPartitions` featurizer as mm1 (so the oracle pins the real
    * plumbing, not a shortcut projection) and joined back to the source
    * rows' typed metadata. Every column is deterministic arithmetic over
    * `documents` — SQL-expressible, hence a full DuckDB hash gate. */
  def mm1bMediaMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Multimodal.syntheticMedia(spark, dir)
    val feats = Multimodal.featurize(media)
      .map(f => (f.doc_id, f.media_type, f.n_bytes))
      .toDF("doc_id", "media_type", "n_bytes")
    val meta = media.toDF().select(col("doc_id"), col("width"), col("height"),
      col("duration_ms"))
    feats.join(meta, "doc_id").orderBy("doc_id")
  }

  /** mm2: deterministic frame sampling of the video rows. */
  def mm2FrameSample(spark: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(Multimodal.syntheticMedia(spark, dir), stepMs = 5000)
      .toDF().orderBy("doc_id", "frame_idx")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm1_media_features" -> (mm1MediaFeatures _),
    "mm1b_media_meta" -> (mm1bMediaMeta _),
    "mm2_frame_sample" -> (mm2FrameSample _)
  )

  /** mm1b's SQL twin reconstructs the synthetic-media metadata from
    * `documents`: type from doc_id mod 3, n_bytes = UTF-8 byte length
    * (DuckDB `strlen` ≡ `text.getBytes("UTF-8").length`), dims/duration
    * from n_chars. mm2's SQL twin: video rows are `doc_id % 3 = 2`,
    * duration is `n_chars * 40` ms, frames every 5000 ms within
    * [0, duration) — `sequence(0, d-1, 5000)` has ⌊(d-1)/5000⌋ + 1
    * elements. */
  def oracle: Map[String, String] = Map(
    "mm1b_media_meta" ->
      """SELECT doc_id,
        |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
        |       WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |  strlen(text) AS n_bytes,
        |  CAST(n_chars % 640 AS INT) AS width,
        |  CAST(n_chars % 480 AS INT) AS height,
        |  n_chars * 40 AS duration_ms
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm2_frame_sample" ->
      """WITH v AS (
        |  SELECT doc_id, unnest(range(0, (n_chars * 40 - 1) // 5000 + 1)) AS k
        |  FROM documents WHERE doc_id % 3 = 2 AND n_chars * 40 > 0)
        |SELECT doc_id, CAST(k AS INT) AS frame_idx,
        |  CAST(k * 5000 AS BIGINT) AS offset_ms
        |FROM v ORDER BY doc_id, frame_idx""".stripMargin
  )
}
