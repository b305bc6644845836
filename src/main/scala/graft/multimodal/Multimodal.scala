package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed by batched per-partition featurizers.
  *
  * The Spark-side shape here is real and tested — schema, partitioning,
  * batch iteration, output contract. The actual media decoding is STUBBED
  * (`decodeStub`): this container has no image/audio codecs, so the decoder
  * is a deterministic fake over the raw bytes. Swapping in a real decoder
  * (JavaCV, TwelveMonkeys, ffmpeg-cli per partition) changes only that one
  * function; everything around it — mapPartitions batching, feature schema,
  * frame-sampling explode — is production plumbing.
  *
  * Scale notes: media blobs ride the DataFrame as binary; featurization is
  * `mapPartitions` with an explicit batch size so native decoders amortize
  * init per batch, not per row — the Scala analog of `mapInPandas` batches.
  * No shuffle is introduced: features are computed where the bytes live.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media_type: String, content: Array[Byte],
                      width: Int, height: Int, duration_ms: Long)
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Long,
                           histogram: Array[Float])

  val histogramBins = 16
  val batchSize = 64

  /** Synthesize a deterministic media table from `documents` (texts as fake
    * blobs) — stands in for `spark.read.format("binaryFile")`. */
  def syntheticMedia(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .map { case (id, text, nChars) =>
        val mt = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        MediaRow(id, mt, text.getBytes("UTF-8"),
          width = (nChars % 640).toInt, height = (nChars % 480).toInt,
          duration_ms = nChars * 40)
      }
  }

  /** STUB decode: a real implementation would decode image pixels / audio
    * samples here. The fake — a byte-value histogram — is deterministic and
    * exercises the identical dataflow. */
  def decodeStub(content: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](histogramBins)
    var i = 0
    while (i < content.length) {
      hist((content(i) & 0xff) * histogramBins / 256) += 1f
      i += 1
    }
    if (content.length > 0) {
      var j = 0
      while (j < histogramBins) { hist(j) /= content.length; j += 1 }
    }
    hist
  }

  /** Batched featurization: explicit batch shape (`grouped(batchSize)`) so a
    * real decoder's per-batch setup cost amortizes — mirrors mapInPandas
    * batch semantics. */
  def featurize(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch decoder init would go here
        batch.iterator.map { r =>
          MediaFeatures(r.doc_id, r.media_type, r.content.length.toLong,
            decodeStub(r.content))
        }
      }
    }
  }

  case class Frame(doc_id: Long, frame_idx: Int, offset_ms: Long)

  /** Frame sampling for video rows: every `stepMs`, as a generator
    * (explode) — rows stay colocated with their source partition. */
  def sampleFrames(media: Dataset[MediaRow], stepMs: Long = 1000): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.toDF()
      .filter(col("media_type") === "video" && col("duration_ms") > 0)
      .select(col("doc_id"),
        posexplode(sequence(lit(0L), col("duration_ms") - 1, lit(stepMs)))
          .as(Seq("frame_idx", "offset_ms")))
      .as[Frame]
  }

  /** Resize stub: recompute metadata only; a real impl rewrites `content`. */
  def resizeStub(media: Dataset[MediaRow], maxDim: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      val scale = if (math.max(r.width, r.height) <= maxDim || math.max(r.width, r.height) == 0) 1.0
      else maxDim.toDouble / math.max(r.width, r.height)
      r.copy(width = (r.width * scale).toInt, height = (r.height * scale).toInt)
    }
  }
}
