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

  // ---- real image-header metadata (mm3) ---------------------------------

  private def be2(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be4(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  /** A REAL (signature + CRC-valid IHDR) PNG header for the given dims —
    * what `binaryFile` over an image corpus would hand the parser. */
  def pngHeader(w: Int, h: Int): Array[Byte] = {
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val typeAndData = "IHDR".getBytes("ISO-8859-1") ++
      be4(w) ++ be4(h) ++ Array[Byte](8, 6, 0, 0, 0) // depth 8, RGBA
    val crc = new java.util.zip.CRC32()
    crc.update(typeAndData)
    sig ++ be4(13) ++ typeAndData ++ be4(crc.getValue.toInt)
  }

  /** A real JPEG marker stream: SOI, JFIF APP0, a COM segment (so the
    * parser must WALK markers, not assume a fixed SOF offset), baseline
    * SOF0 with the dims, EOI. */
  def jpegHeader(w: Int, h: Int): Array[Byte] = {
    val soi = Array(0xff, 0xd8).map(_.toByte)
    val app0 = Array(0xff, 0xe0).map(_.toByte) ++ be2(16) ++
      "JFIF\u0000".getBytes("ISO-8859-1") ++ Array[Byte](1, 1, 0) ++
      be2(72) ++ be2(72) ++ Array[Byte](0, 0)
    val com = Array(0xff, 0xfe).map(_.toByte) ++ be2(4) ++
      "ok".getBytes("ISO-8859-1")
    val sof0 = Array(0xff, 0xc0).map(_.toByte) ++ be2(11) ++
      Array[Byte](8) ++ be2(h) ++ be2(w) ++ Array[Byte](1, 0x11, 0)
    val eoi = Array(0xff, 0xd9).map(_.toByte)
    soi ++ app0 ++ com ++ sof0 ++ eoi
  }

  /** Synthesize a REAL-format image table from `documents` metadata (even
    * doc_id → PNG, odd → JPEG; dims derived from n_chars) — stands in for
    * `binaryFile` over an image corpus, and makes the expected metadata
    * SQL-reconstructible for the oracle while the bytes stay genuine. */
  def syntheticImages(spark: SparkSession, dir: String): Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .map { case (id, nChars) =>
        val w = (nChars % 640).toInt + 1
        val h = (nChars % 480).toInt + 1
        (id, if (id % 2 == 0) pngHeader(w, h) else jpegHeader(w, h))
      }
  }

  /** Dependency-free image-header metadata — NOT a stub: PNG via the
    * signature + IHDR chunk (big-endian dims, bit depth at offset 24),
    * JPEG via a marker WALK (APPn/COM/DQT segments skipped by their
    * declared big-endian lengths until a start-of-frame marker SOFn —
    * C0–CF minus the non-frame C4/C8/CC — whose payload is precision,
    * height, width). Returns None for truncated/alien bytes — contained
    * per file, like the PDF reader. */
  def imageMeta(content: Array[Byte]): Option[(String, Int, Int, Int)] = {
    def u2(i: Int): Int = ((content(i) & 0xff) << 8) | (content(i + 1) & 0xff)
    def u4(i: Int): Int = (u2(i) << 16) | u2(i + 2)
    if (content.length >= 25 &&
      (content(0) & 0xff) == 0x89 && content(1) == 'P' &&
      content(2) == 'N' && content(3) == 'G' &&
      new String(content, 12, 4, "ISO-8859-1") == "IHDR")
      Some(("png", u4(16), u4(20), content(24) & 0xff))
    else if (content.length >= 4 &&
      (content(0) & 0xff) == 0xff && (content(1) & 0xff) == 0xd8) {
      var i = 2
      while (i + 4 <= content.length && (content(i) & 0xff) == 0xff) {
        val marker = content(i + 1) & 0xff
        // EOI or start-of-scan before any frame header: no dims to read
        if (marker == 0xd9 || marker == 0xda) return None
        val len = u2(i + 2)
        if (marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          if (i + 9 > content.length) return None
          return Some(("jpeg", u2(i + 7), u2(i + 5), content(i + 4) & 0xff))
        }
        if (len < 2) return None // malformed segment length
        i += 2 + len
      }
      None
    } else None
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
