package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-visible multimodal queries — ALL oracle-gated since round 9.
  * mm1's stub featurizer is a byte-value histogram, and DuckDB can fold the
  * same UTF-8 bytes via `hex(encode(text))` + 2-char slices, so even the
  * byte-level half now carries a full rows+schema+hash gate (the
  * mapPartitions batching itself is additionally pinned by MultimodalSpec:
  * determinism, partition invariance, batch shape). mm1b is the metadata
  * half — media type, UTF-8 byte count, dimensions, duration. mm2 touches
  * no bytes at all — frame sampling is integer metadata math. */
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

  /** mm3: REAL image-header decoding (round-12 ask — "more than a byte
    * histogram"): the table carries genuine PNG/JPEG bytes (CRC-valid IHDR,
    * walked marker stream) and [[Multimodal.imageMeta]] parses dims/depth
    * from the FORMAT, not from row metadata — through the same batched
    * mapPartitions seam as mm1, so a real pixel decoder slots in behind
    * the identical plumbing. The oracle reconstructs the expected values
    * from the documents arithmetic the synthesizer used, closing the
    * build→parse loop; MultimodalSpec additionally pins hand-assembled
    * real fixtures (1×1 PNG, EXIF-prefixed JPEG, truncation). */
  def mm3ImageMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Multimodal.syntheticImages(spark, dir)
      .mapPartitions { rows =>
        rows.grouped(Multimodal.batchSize).flatMap { batch =>
          // per-batch decoder init would go here (mm1 contract)
          batch.iterator.flatMap { case (id, bytes) =>
            Multimodal.imageMeta(bytes).map {
              case (f, w, h, bd) => (id, f, w, h, bd)
            }
          }
        }
      }
      .toDF("doc_id", "format", "width", "height", "bit_depth")
      .orderBy("doc_id")
  }

  /** mm3b: GIF/BMP header metadata — the two remaining common web-corpus
    * image headers, through the same batched seam and the same parser as
    * mm3 (one `imageMeta` dispatching on real signatures): even doc_id →
    * a genuine GIF89a skeleton (little-endian dims — the OPPOSITE byte
    * order of PNG/JPEG, which the hash gate would catch if swapped — a
    * flagged global color table the parser's field math must respect,
    * colour-resolution bits as the depth), odd → a real "BM" +
    * BITMAPINFOHEADER (little-endian i32 dims, planes = 1, biBitCount
    * cycling 8/24/32). Pixel decode for these formats is a ledger
    * decision (SURVEY §2.11.1): GIF's LZW is feasible future in-engine
    * work; header metadata is what corpus filters key on today. */
  def mm3bGifBmpMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .map { case (id, nChars) =>
        val w = (nChars % 640).toInt + 1
        val h = (nChars % 480).toInt + 1
        if (id % 2 == 0) (id, Multimodal.gifHeader(w, h, (id % 8 + 1).toInt))
        else (id, Multimodal.bmpHeader(w, h, ((id % 3) match {
          case 0 => 8; case 1 => 24; case _ => 32
        })))
      }
      .mapPartitions { rows =>
        rows.grouped(Multimodal.batchSize).flatMap { batch =>
          // per-batch decoder init would go here (mm1 contract)
          batch.iterator.flatMap { case (id, bytes) =>
            Multimodal.imageMeta(bytes).map {
              case (f, w, h, bd) => (id, f, w, h, bd)
            }
          }
        }
      }
      .toDF("doc_id", "format", "width", "height", "bit_depth")
      .orderBy("doc_id")
  }

  /** mm4: the resize stage as a first-class driver query — metadata math
    * today (the stub recomputes dims; a real impl also rewrites bytes),
    * truncating IEEE scale arithmetic both engines reproduce exactly. */
  def mm4ResizeMeta(spark: SparkSession, dir: String): DataFrame =
    Multimodal.resizeStub(Multimodal.syntheticMedia(spark, dir), maxDim = 100)
      .toDF().select("doc_id", "media_type", "width", "height")
      .orderBy("doc_id")

  /** mm5's synthetic table: COMPLETE real PNGs (CRC-valid chunks,
    * per-row-varying filters, two IDAT chunks) whose pixel plane is the
    * deterministic byte formula `((doc_id·31 + idx)·37) mod 256` — so the
    * oracle can reconstruct the EXPECTED pixels arithmetically while the
    * engine must earn them through a genuine inflate + unfilter. Color
    * type cycles gray/RGB/RGBA by doc_id. */
  def syntheticPngs(spark: SparkSession, dir: String): org.apache.spark.sql.Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .map { id =>
        val w = (id % 6 + 2).toInt
        val h = (id % 4 + 2).toInt
        val ct = (id % 3) match { case 0 => 0; case 1 => 2; case _ => 6 }
        val ch = Multimodal.pngChannels(ct)
        val px = new Array[Byte](w * h * ch)
        var i = 0
        while (i < px.length) { px(i) = (((id * 31 + i) * 37) % 256).toByte; i += 1 }
        (id, Multimodal.encodePng(w, h, ct, px))
      }
  }

  /** mm5: REAL pixel statistics (round-12 ask — "mm3 parses headers, mm1
    * still hashes compressed bytes"): each row's PNG is fully decoded
    * (CRC-checked chunk walk → Inflater → Sub/Up/Average/Paeth
    * unfiltering, reusing the PDF /DecodeParms filter family) and the
    * stats — integer luma sum (ITU-R BT.709 coefficients as exact
    * integer arithmetic), channel min/max, pixel count, mean luma — are
    * computed from the DECODED plane through the same batched
    * mapPartitions seam as mm1/mm3. A hash match against the oracle's
    * formula-reconstructed pixels proves the encode→decode round trip is
    * lossless end-to-end. */
  def mm5PixelStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    syntheticPngs(spark, dir)
      .mapPartitions { rows =>
        rows.grouped(Multimodal.batchSize).flatMap { batch =>
          // per-batch decoder init would go here (mm1 contract)
          batch.iterator.flatMap { case (id, bytes) =>
            Multimodal.decodePng(bytes).map { img =>
              val (n, lum, mn, mx) = Multimodal.pngStats(img)
              (id, img.width, img.height, img.channels, n, lum, mn, mx,
                lum.toDouble / n.toDouble)
            }
          }
        }
      }
      .toDF("doc_id", "width", "height", "channels", "n_pixels", "lum_sum",
        "px_min", "px_max", "mean_luma")
      .orderBy("doc_id")
  }

  /** mm5b's synthetic table: COMPLETE real PALETTE PNGs (ct = 3 — the
    * dominant web-corpus PNG shape and round-13's most-hit refusal): a
    * full 256-entry PLTE whose triples follow the formulas
    * `r = (k·7+1) % 256, g = (k·11+3) % 256, b = (k·13+5) % 256`, and an
    * index plane `((doc_id·31 + i)·37) % 256` — both arithmetically
    * reconstructible by the oracle, while the engine must earn the pixels
    * through a genuine inflate + unfilter + palette expansion. Same
    * per-row-varying filters and two-IDAT split as mm5's writer. */
  def syntheticPalettePngs(spark: SparkSession, dir: String): org.apache.spark.sql.Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    val pal = new Array[Byte](768)
    var k = 0
    while (k < 256) {
      pal(k * 3) = ((k * 7 + 1) % 256).toByte
      pal(k * 3 + 1) = ((k * 11 + 3) % 256).toByte
      pal(k * 3 + 2) = ((k * 13 + 5) % 256).toByte
      k += 1
    }
    graft.Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .map { id =>
        val w = (id % 6 + 2).toInt
        val h = (id % 4 + 2).toInt
        val idxPlane = new Array[Byte](w * h)
        var i = 0
        while (i < idxPlane.length) {
          idxPlane(i) = (((id * 31 + i) * 37) % 256).toByte; i += 1
        }
        (id, Multimodal.encodePng(w, h, 3, idxPlane, Some(pal)))
      }
  }

  /** mm5b: pixel statistics over PALETTE PNGs (round-13 VERDICT #2 —
    * "lift the most common refusal"): the same decode → stats dataflow as
    * mm5, but every row routes through the PLTE expansion path, so a hash
    * match proves chunk ordering, the indexed unfilter (bpp = 1), and the
    * palette lookup are all lossless. Output schema identical to mm5;
    * `channels` is 3 for every row (indexed decodes to truecolor). */
  def mm5bPaletteStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    syntheticPalettePngs(spark, dir)
      .mapPartitions { rows =>
        rows.grouped(Multimodal.batchSize).flatMap { batch =>
          // per-batch decoder init would go here (mm1 contract)
          batch.iterator.flatMap { case (id, bytes) =>
            Multimodal.decodePng(bytes).map { img =>
              val (n, lum, mn, mx) = Multimodal.pngStats(img)
              (id, img.width, img.height, img.channels, n, lum, mn, mx,
                lum.toDouble / n.toDouble)
            }
          }
        }
      }
      .toDF("doc_id", "width", "height", "channels", "n_pixels", "lum_sum",
        "px_min", "px_max", "mean_luma")
      .orderBy("doc_id")
  }

  /** mm5c's synthetic table: 16-BIT PNGs (gray / RGB by doc parity) whose
    * big-endian u16 samples follow `((doc_id·131 + k)·257) mod 65536` —
    * the deep-color shape (photography, medical, scientific corpora) that
    * was a refusal until round 14. */
  def syntheticDeepPngs(spark: SparkSession, dir: String): org.apache.spark.sql.Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .map { id =>
        val w = (id % 6 + 2).toInt
        val h = (id % 4 + 2).toInt
        val ct = if (id % 2 == 0) 0 else 2
        val ch = Multimodal.pngChannels(ct)
        val samples = new Array[Int](w * h * ch)
        var k = 0
        while (k < samples.length) {
          samples(k) = (((id * 131 + k) * 257) % 65536).toInt; k += 1
        }
        (id, Multimodal.encodePng16(w, h, ct, samples))
      }
  }

  /** mm5c: pixel statistics over 16-BIT PNGs — same decode → stats
    * dataflow, but the plane carries big-endian u16 samples (the filter
    * inversion runs on bytes with bpp = channels·2, per the spec) and the
    * BT.709 integer luma runs on the full 0..65535 range with no
    * precision downshift. The oracle reconstructs the u16 samples
    * arithmetically; a hash match proves the two-byte sample order and
    * the 16-bit unfilter byte offsets are exactly right. */
  def mm5cDeepStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    syntheticDeepPngs(spark, dir)
      .mapPartitions { rows =>
        rows.grouped(Multimodal.batchSize).flatMap { batch =>
          // per-batch decoder init would go here (mm1 contract)
          batch.iterator.flatMap { case (id, bytes) =>
            Multimodal.decodePng(bytes).map { img =>
              val (n, lum, mn, mx) = Multimodal.pngStats(img)
              (id, img.width, img.height, img.channels, img.bitDepth,
                n, lum, mn, mx, lum.toDouble / n.toDouble)
            }
          }
        }
      }
      .toDF("doc_id", "width", "height", "channels", "bit_depth",
        "n_pixels", "lum_sum", "px_min", "px_max", "mean_luma")
      .orderBy("doc_id")
  }

  /** mm5d: pixel statistics over ADAM7-INTERLACED PNGs — the same pixel
    * formula, color-type cycle, and output schema as mm5, but every file
    * is written interlaced (seven independently-filtered sub-images). The
    * oracle is BY DESIGN the identical SQL as mm5's: de-interlacing must
    * reproduce exactly the plane the progressive layout scattered, so a
    * hash match proves the pass geometry, per-pass filter inversion, and
    * scatter offsets are all byte-exact. */
  def mm5dInterlacedStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    syntheticInterlacedPngs(spark, dir)
      .mapPartitions { rows =>
        rows.grouped(Multimodal.batchSize).flatMap { batch =>
          // per-batch decoder init would go here (mm1 contract)
          batch.iterator.flatMap { case (id, bytes) =>
            Multimodal.decodePng(bytes).map { img =>
              val (n, lum, mn, mx) = Multimodal.pngStats(img)
              (id, img.width, img.height, img.channels, n, lum, mn, mx,
                lum.toDouble / n.toDouble)
            }
          }
        }
      }
      .toDF("doc_id", "width", "height", "channels", "n_pixels", "lum_sum",
        "px_min", "px_max", "mean_luma")
      .orderBy("doc_id")
  }

  /** mm5d's synthetic table: mm5's exact pixel planes written INTERLACED
    * (interlace method 1). Dims up to 7×5 exercise passes that are empty,
    * single-pixel, and multi-row. */
  def syntheticInterlacedPngs(spark: SparkSession, dir: String): org.apache.spark.sql.Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .map { id =>
        val w = (id % 6 + 2).toInt
        val h = (id % 4 + 2).toInt
        val ct = (id % 3) match { case 0 => 0; case 1 => 2; case _ => 6 }
        val ch = Multimodal.pngChannels(ct)
        val px = new Array[Byte](w * h * ch)
        var i = 0
        while (i < px.length) { px(i) = (((id * 31 + i) * 37) % 256).toByte; i += 1 }
        (id, Multimodal.encodePngAdam7(w, h, ct, px))
      }
  }

  /** mm6's synthetic table: COMPLETE real WAV files (RIFF chunk walk
    * required: an INFO LIST with an odd payload sits between fmt and
    * data) whose 16-bit LPCM samples follow
    * `((doc_id·131 + k)·9973) mod 65536 − 32768` — arithmetically
    * reconstructible while the bytes stay genuine RIFF. Mono/stereo by
    * doc parity, three sample rates. */
  def syntheticWavs(spark: SparkSession, dir: String): org.apache.spark.sql.Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .map { id =>
        val ch = (id % 2 + 1).toInt
        val rate = (8000 + (id % 3) * 4000).toInt
        val frames = (id % 50 + 10).toInt
        val samples = new Array[Short](frames * ch)
        var k = 0
        while (k < samples.length) {
          samples(k) = (((id * 131 + k) * 9973) % 65536 - 32768).toShort
          k += 1
        }
        (id, Multimodal.encodeWav(ch, rate, samples))
      }
  }

  /** mm6: REAL audio decode — the second modality done the mm5 way: each
    * row's WAV is decoded through the RIFF chunk walk (fmt validation,
    * LIST skip, pad-byte rule, little-endian 16-bit LPCM) and the stats —
    * exact BIGINT power sum (RMS derives as one double division + sqrt),
    * peak amplitude, clipped-sample count, integer duration — run on the
    * DECODED samples through the same batched mapPartitions seam. A hash
    * match against the oracle's formula-reconstructed samples proves the
    * byte order, frame layout, and chunk walk lossless. */
  def mm6AudioStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    syntheticWavs(spark, dir)
      .mapPartitions { rows =>
        rows.grouped(Multimodal.batchSize).flatMap { batch =>
          // per-batch decoder init would go here (mm1 contract)
          batch.iterator.flatMap { case (id, bytes) =>
            Multimodal.decodeWav(bytes).map { a =>
              val (n, sumSq, peak, clipped) = Multimodal.wavStats(a)
              (id, a.channels, a.sampleRate, a.frames, n,
                a.frames.toLong * 1000L / a.sampleRate, sumSq, peak, clipped,
                math.sqrt(sumSq.toDouble / n.toDouble))
            }
          }
        }
      }
      .toDF("doc_id", "channels", "sample_rate", "frames", "n_samples",
        "duration_ms", "sum_sq", "peak", "clipped", "rms")
      .orderBy("doc_id")
  }

  /** mm6b's synthetic table: 8-BIT and 24-BIT PCM WAVs (the common
    * speech-corpus widths that were refusals through round 14). Width and
    * channel count decorrelate (doc_id mod 4 → mono/stereo at both
    * widths); sample k's DECODED value follows
    * `((doc_id·131 + k)·9973) mod 2^bits − 2^(bits−1)` — the engine must
    * recover it through the unsigned-rebias (8-bit) or the 3-byte
    * little-endian sign extension (24-bit). */
  def syntheticWideWavs(spark: SparkSession, dir: String): org.apache.spark.sql.Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .map { id =>
        val ch = ((id % 4) / 2 + 1).toInt
        val rate = (8000 + (id % 3) * 4000).toInt
        val frames = (id % 50 + 10).toInt
        val bits = if (id % 2 == 0) 8 else 24
        val half = 1L << (bits - 1)
        val samples = new Array[Int](frames * ch)
        var k = 0
        while (k < samples.length) {
          samples(k) = (((id * 131 + k) * 9973) % (half * 2) - half).toInt
          k += 1
        }
        (id, Multimodal.encodeWavBits(ch, rate, bits, samples))
      }
  }

  /** mm6b: audio stats across the LPCM width matrix — same decode → stats
    * dataflow as mm6, over 8- and 24-bit files. The exact-BIGINT power
    * sum discipline holds at 24-bit (s² ≤ 2⁴⁶); clip rails are
    * width-relative (−128/127, ±(2²³−1/−2²³)). A hash match proves the
    * unsigned-center convention and the 3-byte sign extension are exactly
    * the documented arithmetic. */
  def mm6bWideAudioStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    syntheticWideWavs(spark, dir)
      .mapPartitions { rows =>
        rows.grouped(Multimodal.batchSize).flatMap { batch =>
          // per-batch decoder init would go here (mm1 contract)
          batch.iterator.flatMap { case (id, bytes) =>
            Multimodal.decodeWav(bytes).map { a =>
              val (n, sumSq, peak, clipped) = Multimodal.wavStats(a)
              (id, a.channels, a.sampleRate, a.bits, a.frames, n,
                a.frames.toLong * 1000L / a.sampleRate, sumSq, peak, clipped,
                math.sqrt(sumSq.toDouble / n.toDouble))
            }
          }
        }
      }
      .toDF("doc_id", "channels", "sample_rate", "bits", "frames",
        "n_samples", "duration_ms", "sum_sq", "peak", "clipped", "rms")
      .orderBy("doc_id")
  }

  /** mm5e: ALPHA-PALETTE stats (ct = 3 + tRNS — logos/icons with
    * transparency, the web's other indexed shape): mm5b's exact palette
    * and index formulas plus a 128-entry tRNS table, decoded to RGBA.
    * The oracle is mm5b's SQL with `channels = 4`: alpha is excluded
    * from luma/min/max by contract, so identical RGB stats arriving
    * through the RGBA expansion prove the alpha path changes layout,
    * never pixel values. */
  def mm5eAlphaPaletteStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pal = new Array[Byte](768)
    val trns = new Array[Byte](128)
    var k = 0
    while (k < 256) {
      pal(k * 3) = ((k * 7 + 1) % 256).toByte
      pal(k * 3 + 1) = ((k * 11 + 3) % 256).toByte
      pal(k * 3 + 2) = ((k * 13 + 5) % 256).toByte
      if (k < 128) trns(k) = ((k * 3 + 7) % 256).toByte
      k += 1
    }
    graft.Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .map { id =>
        val w = (id % 6 + 2).toInt
        val h = (id % 4 + 2).toInt
        val idxPlane = new Array[Byte](w * h)
        var i = 0
        while (i < idxPlane.length) {
          idxPlane(i) = (((id * 31 + i) * 37) % 256).toByte; i += 1
        }
        (id, Multimodal.encodePngAlphaPalette(w, h, idxPlane, pal, trns))
      }
      .mapPartitions { rows =>
        rows.grouped(Multimodal.batchSize).flatMap { batch =>
          batch.iterator.flatMap { case (id, bytes) =>
            Multimodal.decodePng(bytes).map { img =>
              val (n, lum, mn, mx) = Multimodal.pngStats(img)
              (id, img.width, img.height, img.channels, n, lum, mn, mx,
                lum.toDouble / n.toDouble)
            }
          }
        }
      }
      .toDF("doc_id", "width", "height", "channels", "n_pixels", "lum_sum",
        "px_min", "px_max", "mean_luma")
      .orderBy("doc_id")
  }

  /** mm5f's synthetic table: SUB-BYTE PNGs — the last cell of the PNG
    * depth matrix (1-bit B/W scans, 2-bit gray, 4-bit palette icons —
    * common web-corpus shapes that were refusals through round 14). Depth
    * cycles 1/2/4 by doc_id mod 3; even docs are grayscale (ct 0), odd
    * docs indexed (ct 3) through a full 2^depth-entry palette using
    * mm5b's triple formulas; every fifth file is ALSO Adam7-interlaced,
    * so the sub-byte × interlace composition (per-pass bit packing) is
    * driver-gated, not just spec-gated. Samples follow
    * `((doc_id·31 + i)·37) mod 2^depth` — arithmetically reconstructible
    * while the engine must earn them through inflate + packed-row
    * unfilter + MSB-first unpack (+ palette expansion / pass scatter). */
  def syntheticSubBytePngs(spark: SparkSession, dir: String): org.apache.spark.sql.Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .map { id =>
        val w = (id % 6 + 2).toInt
        val h = (id % 4 + 2).toInt
        val d = (id % 3) match { case 0 => 1; case 1 => 2; case _ => 4 }
        val n = 1 << d
        val samples = new Array[Byte](w * h)
        var i = 0
        while (i < samples.length) {
          samples(i) = (((id * 31 + i) * 37) % n).toByte; i += 1
        }
        val gray = id % 2 == 0
        val pal =
          if (gray) None
          else Some(Array.tabulate(n * 3) { j =>
            val k = j / 3
            (j % 3) match {
              case 0 => ((k * 7 + 1) % 256).toByte
              case 1 => ((k * 11 + 3) % 256).toByte
              case _ => ((k * 13 + 5) % 256).toByte
            }
          })
        val ct = if (gray) 0 else 3
        val bytes =
          if (id % 5 == 0) Multimodal.encodePngAdam7(w, h, ct, samples, pal, depth = d)
          else Multimodal.encodePngSubByte(w, h, ct, d, samples, pal)
        (id, bytes)
      }
  }

  /** mm5f: pixel statistics over SUB-BYTE PNGs — closes the PNG depth
    * matrix (VERDICT r14 #2). Gray sub-byte stats run on the raw
    * 0..2^depth−1 sample values (the BT.709 identity makes gray luma
    * exactly the sample); palette rows expand to 8-bit truecolor, so
    * `bit_depth` reports the engine's decoded-plane depth: the source
    * depth for gray, 8 for palette (the expansion's output range). A hash
    * match proves packed-row filtering, MSB-first unpacking, per-pass
    * packing under Adam7, and palette lookup are all byte-exact. */
  def mm5fSubByteStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    syntheticSubBytePngs(spark, dir)
      .mapPartitions { rows =>
        rows.grouped(Multimodal.batchSize).flatMap { batch =>
          // per-batch decoder init would go here (mm1 contract)
          batch.iterator.flatMap { case (id, bytes) =>
            Multimodal.decodePng(bytes).map { img =>
              val (n, lum, mn, mx) = Multimodal.pngStats(img)
              (id, img.width, img.height, img.channels, img.bitDepth,
                n, lum, mn, mx, lum.toDouble / n.toDouble)
            }
          }
        }
      }
      .toDF("doc_id", "width", "height", "channels", "bit_depth",
        "n_pixels", "lum_sum", "px_min", "px_max", "mean_luma")
      .orderBy("doc_id")
  }

  /** mm7: REAL video-container metadata — the third modality's header
    * walk, done the mm3 way: each row is a genuine ISOBMFF file (ftyp, a
    * free box the walk must skip, moov{mvhd/udta/trak{tkhd}}, mdat; every
    * third file uses the version-1 mvhd so the 64-bit offsets are
    * exercised) and [[Multimodal.mp4Meta]] parses brand, movie
    * timescale/duration, and per-track 16.16 presentation sizes from the
    * FORMAT. The oracle reconstructs the same values from the generator
    * formulas; duration_ms is the exact integer division both engines
    * run. */
  def mm7VideoMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .map { id =>
        val brand = if (id % 2 == 0) "isom" else "mp42"
        val ts = 600L + (id % 5) * 200L
        val dur = id % 9000 + 600
        val n = (id % 3 + 1).toInt
        val tracks = (0 until n).map { k =>
          (((id * 13 + k * 7) % 1905 + 16).toInt,
           ((id * 17 + k * 11) % 1065 + 16).toInt)
        }
        (id, Multimodal.encodeMp4(brand, ts, dur, tracks, v1Mvhd = id % 3 == 0))
      }
      .mapPartitions { rows =>
        rows.grouped(Multimodal.batchSize).flatMap { batch =>
          // per-batch decoder init would go here (mm1 contract)
          batch.iterator.flatMap { case (id, bytes) =>
            Multimodal.mp4Meta(bytes).map { m =>
              (id, m.brand, m.timescale, m.duration,
                m.duration * 1000L / m.timescale, m.nTracks,
                m.maxWidth, m.maxHeight)
            }
          }
        }
      }
      .toDF("doc_id", "brand", "timescale", "duration", "duration_ms",
        "n_tracks", "max_width", "max_height")
      .orderBy("doc_id")
  }

  /** mm7b: PER-TRACK container metadata (round-15 VERDICT #5) — the
    * columns a video-corpus filter actually keys on: each row is one
    * track with its tkhd identity/size, hdlr handler (vide/soun by track
    * parity), stsd codec 4cc (avc1/mp4a), and mdhd media timescale/
    * duration — v1 tkhd+mdhd every third file so the 64-bit offsets are
    * exercised under the deeper walk. The oracle reconstructs every
    * column from the generator formulas; a hash match proves the
    * four-level moov→trak→mdia→minf→stbl descent reads each box's
    * version-dependent offsets exactly. */
  def mm7bTrackMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .map { id =>
        val brand = if (id % 2 == 0) "isom" else "mp42"
        val ts = 600L + (id % 5) * 200L
        val dur = id % 9000 + 600
        val n = (id % 3 + 1).toInt
        val tracks = (0 until n).map { k =>
          Multimodal.Mp4Track(
            trackId = k + 1L,
            width = ((id * 13 + k * 7) % 1905 + 16).toInt,
            height = ((id * 17 + k * 11) % 1065 + 16).toInt,
            handler = if (k % 2 == 0) "vide" else "soun",
            codec = if (k % 2 == 0) "avc1" else "mp4a",
            mediaTimescale = 1000L + (id % 7) * 100L + k * 10L,
            mediaDuration = (id % 9000 + 600) * (k + 1L))
        }
        (id, Multimodal.encodeMp4WithTracks(brand, ts, dur, tracks,
          v1 = id % 3 == 0))
      }
      .mapPartitions { rows =>
        rows.grouped(Multimodal.batchSize).flatMap { batch =>
          // per-batch decoder init would go here (mm1 contract)
          batch.iterator.flatMap { case (id, bytes) =>
            Multimodal.mp4Tracks(bytes).toSeq.flatten.map { t =>
              (id, t.trackId, t.handler, t.codec, t.width, t.height,
                t.mediaTimescale, t.mediaDuration,
                t.mediaDuration * 1000L / t.mediaTimescale)
            }
          }
        }
      }
      .toDF("doc_id", "track_id", "handler", "codec", "width", "height",
        "media_timescale", "media_duration", "media_duration_ms")
      .orderBy("doc_id", "track_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm1_media_features" -> (mm1MediaFeatures _),
    "mm1b_media_meta" -> (mm1bMediaMeta _),
"mm2_frame_sample" -> (mm2FrameSample _),
    "mm3_image_meta" -> (mm3ImageMeta _),
    "mm3b_gif_bmp_meta" -> (mm3bGifBmpMeta _),
    "mm4_resize_meta" -> (mm4ResizeMeta _),
    "mm5_pixel_stats" -> (mm5PixelStats _),
    "mm5b_palette_stats" -> (mm5bPaletteStats _),
    "mm5c_deep_stats" -> (mm5cDeepStats _),
    "mm5d_interlaced_stats" -> (mm5dInterlacedStats _),
    "mm6_audio_stats" -> (mm6AudioStats _),
    "mm6b_wide_audio_stats" -> (mm6bWideAudioStats _),
    "mm5e_alpha_palette_stats" -> (mm5eAlphaPaletteStats _),
    "mm5f_subbyte_stats" -> (mm5fSubByteStats _),
    "mm7_video_meta" -> (mm7VideoMeta _),
    "mm7b_track_meta" -> (mm7bTrackMeta _)
  )

  /** mm1b's SQL twin reconstructs the synthetic-media metadata from
    * `documents`: type from doc_id mod 3, n_bytes = UTF-8 byte length
    * (DuckDB `strlen` ≡ `text.getBytes("UTF-8").length`), dims/duration
    * from n_chars. mm2's SQL twin: video rows are `doc_id % 3 = 2`,
    * duration is `n_chars * 40` ms, frames every 5000 ms within
    * [0, duration) — `sequence(0, d-1, 5000)` has ⌊(d-1)/5000⌋ + 1
    * elements. */
  def oracle: Map[String, String] = baseOracle +
    // mm5d: the SAME SQL as mm5 on purpose — interlacing changes only the
    // byte layout; the decode must recover the identical plane, and the
    // hash gate proves the Adam7 geometry byte-exact.
    ("mm5d_interlaced_stats" -> baseOracle("mm5_pixel_stats")) +
    // mm5e: mm5b's SQL with channels = 4 — the RGB stats must survive the
    // RGBA expansion unchanged (alpha excluded by contract)
    ("mm5e_alpha_palette_stats" -> baseOracle("mm5b_palette_stats")
      .replace("CAST(3 AS INT) AS channels", "CAST(4 AS INT) AS channels"))

  private def baseOracle: Map[String, String] = Map(
    "mm1_media_features" ->
      s"""WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS h, strlen(text) AS n
        |  FROM documents),
        |bytes AS (
        |  SELECT doc_id, n,
        |    unnest(list_transform(range(0, CAST(n AS BIGINT)),
        |      i -> CAST(('0x' || substr(h, CAST(2*i+1 AS INT), 2)) AS INT)
        |             // ${256 / Multimodal.histogramBins})) AS bin
        |  FROM b WHERE n > 0),
        |counts AS (
        |  SELECT doc_id, bin, COUNT(*) AS c FROM bytes GROUP BY doc_id, bin),
        |grid AS (
        |  SELECT d.doc_id, d.n, g.bin, coalesce(c.c, 0) AS c
        |  FROM b d CROSS JOIN (SELECT unnest(range(0, ${Multimodal.histogramBins})) AS bin) g
        |  LEFT JOIN counts c ON c.doc_id = d.doc_id AND c.bin = g.bin),
        |ranked AS (
        |  SELECT doc_id, n, bin, c,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, bin ASC) AS rk
        |  FROM grid)
        |SELECT r.doc_id,
        |  CASE CAST(r.doc_id % 3 AS INT) WHEN 0 THEN 'image'
        |       WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |  CAST(r.n AS BIGINT) AS n_bytes,
        |  CAST(r.bin AS INT) AS dominant_bin,
        |  CASE WHEN r.n = 0 THEN 0.0
        |       ELSE CAST(CAST(r.c AS FLOAT) / CAST(r.n AS FLOAT) AS DOUBLE)
        |  END AS dominant_frac
        |FROM ranked r WHERE rk = 1 ORDER BY doc_id""".stripMargin,
    "mm1b_media_meta" ->
      """SELECT doc_id,
        |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
        |       WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |  strlen(text) AS n_bytes,
        |  CAST(n_chars % 640 AS INT) AS width,
        |  CAST(n_chars % 480 AS INT) AS height,
        |  n_chars * 40 AS duration_ms
        |FROM documents ORDER BY doc_id""".stripMargin,
    // mm3: even doc_id → PNG, odd → JPEG; dims = n_chars % 640/480 + 1,
    // bit depth 8 in both headers the synthesizer writes. A row surviving
    // to the hash gate means the REAL format bytes round-tripped through
    // the real parser to exactly these values — any header/endianness/
    // marker-walk bug changes the parsed dims and fails the hash.
    "mm3_image_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
        |  CAST(n_chars % 640 + 1 AS INT) AS width,
        |  CAST(n_chars % 480 + 1 AS INT) AS height,
        |  CAST(8 AS INT) AS bit_depth
        |FROM documents ORDER BY doc_id""".stripMargin,
    // mm3b: even → gif (colour-resolution bits = doc_id%8+1), odd → bmp
    // (biBitCount cycles 8/24/32 by doc_id%3); dims from the n_chars
    // formulas. A row surviving the hash gate means the real GIF/BMP
    // bytes round-tripped through the little-endian field math exactly.
    "mm3b_gif_bmp_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'gif' ELSE 'bmp' END AS format,
        |  CAST(n_chars % 640 + 1 AS INT) AS width,
        |  CAST(n_chars % 480 + 1 AS INT) AS height,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN doc_id % 8 + 1
        |            ELSE CASE CAST(doc_id % 3 AS INT)
        |                 WHEN 0 THEN 8 WHEN 1 THEN 24 ELSE 32 END
        |       END AS INT) AS bit_depth
        |FROM documents ORDER BY doc_id""".stripMargin,
    // mm4: scale = maxDim / max(w,h) in double, components scaled THEN
    // truncated (Scala .toInt ≡ DuckDB trunc-then-cast; plain CAST rounds)
    "mm4_resize_meta" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
        |         WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |    CAST(n_chars % 640 AS INT) AS w, CAST(n_chars % 480 AS INT) AS h
        |  FROM documents)
        |SELECT doc_id, media_type,
        |  CASE WHEN GREATEST(w, h) <= 100 OR GREATEST(w, h) = 0 THEN w
        |       ELSE CAST(trunc(w * (100.0 / GREATEST(w, h))) AS INT) END AS width,
        |  CASE WHEN GREATEST(w, h) <= 100 OR GREATEST(w, h) = 0 THEN h
        |       ELSE CAST(trunc(h * (100.0 / GREATEST(w, h))) AS INT) END AS height
        |FROM m ORDER BY doc_id""".stripMargin,
    // mm5: the oracle reconstructs the pixel plane from the generator
    // formula ((doc_id·31 + idx)·37) % 256 and aggregates the same integer
    // luma/min/max — a hash match means the engine's inflate + unfilter
    // recovered every pixel byte exactly.
    "mm5_pixel_stats" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    CAST(doc_id % 6 + 2 AS INT) AS w,
        |    CAST(doc_id % 4 + 2 AS INT) AS h,
        |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END AS ch
        |  FROM documents),
        |px AS (
        |  SELECT doc_id, w, h, ch,
        |    unnest(range(0, CAST(w AS BIGINT) * h)) AS i
        |  FROM p),
        |rgb AS (
        |  SELECT doc_id, w, h, ch,
        |    ((doc_id*31 + i*ch + 0) * 37) % 256 AS c0,
        |    CASE WHEN ch >= 3 THEN ((doc_id*31 + i*ch + 1) * 37) % 256
        |         ELSE ((doc_id*31 + i*ch) * 37) % 256 END AS c1,
        |    CASE WHEN ch >= 3 THEN ((doc_id*31 + i*ch + 2) * 37) % 256
        |         ELSE ((doc_id*31 + i*ch) * 37) % 256 END AS c2
        |  FROM px),
        |lum AS (
        |  SELECT doc_id, w, h, ch,
        |    (2126*c0 + 7152*c1 + 722*c2) // 10000 AS luma,
        |    LEAST(c0, c1, c2) AS mn, GREATEST(c0, c1, c2) AS mx
        |  FROM rgb)
        |SELECT doc_id, w AS width, h AS height, CAST(ch AS INT) AS channels,
        |  CAST(COUNT(*) AS BIGINT) AS n_pixels,
        |  CAST(SUM(luma) AS BIGINT) AS lum_sum,
        |  CAST(MIN(mn) AS INT) AS px_min, CAST(MAX(mx) AS INT) AS px_max,
        |  CAST(CAST(SUM(luma) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
        |    AS mean_luma
        |FROM lum GROUP BY doc_id, w, h, ch ORDER BY doc_id""".stripMargin,
    // mm7: brand/timescale/duration from the doc_id formulas; track dims
    // maxed over k in range(0, n); duration_ms = duration*1000 // timescale.
    "mm7_video_meta" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 2 = 0 THEN 'isom' ELSE 'mp42' END AS brand,
        |    600 + (doc_id % 5) * 200 AS ts,
        |    doc_id % 9000 + 600 AS dur,
        |    CAST(doc_id % 3 + 1 AS INT) AS n
        |  FROM documents),
        |t AS (
        |  SELECT doc_id,
        |    unnest(range(0, CAST(n AS BIGINT))) AS k
        |  FROM p),
        |dims AS (
        |  SELECT doc_id,
        |    MAX((doc_id*13 + k*7) % 1905 + 16) AS mw,
        |    MAX((doc_id*17 + k*11) % 1065 + 16) AS mh
        |  FROM t GROUP BY doc_id)
        |SELECT p.doc_id, p.brand,
        |  CAST(p.ts AS BIGINT) AS timescale,
        |  CAST(p.dur AS BIGINT) AS duration,
        |  CAST(p.dur * 1000 // p.ts AS BIGINT) AS duration_ms,
        |  p.n AS n_tracks,
        |  CAST(d.mw AS INT) AS max_width, CAST(d.mh AS INT) AS max_height
        |FROM p JOIN dims d ON d.doc_id = p.doc_id
        |ORDER BY p.doc_id""".stripMargin,
    // mm7b: per-track rows from the generator formulas — track k of doc:
    // id = k+1, handler/codec by k parity, media timescale
    // 1000 + (id%7)*100 + k*10, media duration (id%9000+600)*(k+1);
    // duration_ms is the exact integer division both engines run.
    "mm7b_track_meta" ->
      """WITH p AS (
        |  SELECT doc_id, CAST(doc_id % 3 + 1 AS INT) AS n FROM documents),
        |t AS (
        |  SELECT doc_id, unnest(range(0, CAST(n AS BIGINT))) AS k FROM p)
        |SELECT doc_id,
        |  CAST(k + 1 AS BIGINT) AS track_id,
        |  CASE WHEN k % 2 = 0 THEN 'vide' ELSE 'soun' END AS handler,
        |  CASE WHEN k % 2 = 0 THEN 'avc1' ELSE 'mp4a' END AS codec,
        |  CAST((doc_id*13 + k*7) % 1905 + 16 AS INT) AS width,
        |  CAST((doc_id*17 + k*11) % 1065 + 16 AS INT) AS height,
        |  CAST(1000 + (doc_id % 7) * 100 + k * 10 AS BIGINT) AS media_timescale,
        |  CAST((doc_id % 9000 + 600) * (k + 1) AS BIGINT) AS media_duration,
        |  CAST(((doc_id % 9000 + 600) * (k + 1)) * 1000
        |       // (1000 + (doc_id % 7) * 100 + k * 10) AS BIGINT)
        |    AS media_duration_ms
        |FROM t ORDER BY doc_id, track_id""".stripMargin,
    // mm6: sample k of doc = ((doc_id*131 + k)*9973) % 65536 - 32768;
    // exact integer power sum, peak, clip count; duration and RMS via the
    // same integer-division / double-sqrt chains the engine runs.
    "mm6_audio_stats" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    CAST(doc_id % 2 + 1 AS INT) AS ch,
        |    CAST(8000 + (doc_id % 3) * 4000 AS INT) AS rate,
        |    CAST(doc_id % 50 + 10 AS INT) AS frames
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, ch, rate, frames,
        |    ((doc_id*131 + unnest(range(0, CAST(frames AS BIGINT) * ch))) * 9973)
        |      % 65536 - 32768 AS v
        |  FROM p)
        |SELECT doc_id, ch AS channels, rate AS sample_rate, frames,
        |  CAST(COUNT(*) AS BIGINT) AS n_samples,
        |  CAST(CAST(frames AS BIGINT) * 1000 // rate AS BIGINT) AS duration_ms,
        |  CAST(SUM(v*v) AS BIGINT) AS sum_sq,
        |  CAST(MAX(ABS(v)) AS INT) AS peak,
        |  CAST(SUM(CASE WHEN v = 32767 OR v = -32768 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS clipped,
        |  sqrt(CAST(CAST(SUM(v*v) AS BIGINT) AS DOUBLE)
        |       / CAST(COUNT(*) AS DOUBLE)) AS rms
        |FROM s GROUP BY doc_id, ch, rate, frames ORDER BY doc_id""".stripMargin,
    // mm5c: u16 sample k of doc = ((doc_id*131 + k)*257) % 65536; pixel p
    // channel c has k = p*ch + c. Same integer BT.709 luma on the 16-bit
    // range — a hash match means the engine recovered every two-byte
    // big-endian sample through the 16-bit unfilter exactly.
    "mm5c_deep_stats" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    CAST(doc_id % 6 + 2 AS INT) AS w,
        |    CAST(doc_id % 4 + 2 AS INT) AS h,
        |    CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS ch
        |  FROM documents),
        |px AS (
        |  SELECT doc_id, w, h, ch,
        |    unnest(range(0, CAST(w AS BIGINT) * h)) AS i
        |  FROM p),
        |rgb AS (
        |  SELECT doc_id, w, h, ch,
        |    ((doc_id*131 + i*ch + 0) * 257) % 65536 AS c0,
        |    CASE WHEN ch >= 3 THEN ((doc_id*131 + i*ch + 1) * 257) % 65536
        |         ELSE ((doc_id*131 + i*ch) * 257) % 65536 END AS c1,
        |    CASE WHEN ch >= 3 THEN ((doc_id*131 + i*ch + 2) * 257) % 65536
        |         ELSE ((doc_id*131 + i*ch) * 257) % 65536 END AS c2
        |  FROM px),
        |lum AS (
        |  SELECT doc_id, w, h, ch,
        |    (2126*c0 + 7152*c1 + 722*c2) // 10000 AS luma,
        |    LEAST(c0, c1, c2) AS mn, GREATEST(c0, c1, c2) AS mx
        |  FROM rgb)
        |SELECT doc_id, w AS width, h AS height, CAST(ch AS INT) AS channels,
        |  CAST(16 AS INT) AS bit_depth,
        |  CAST(COUNT(*) AS BIGINT) AS n_pixels,
        |  CAST(SUM(luma) AS BIGINT) AS lum_sum,
        |  CAST(MIN(mn) AS INT) AS px_min, CAST(MAX(mx) AS INT) AS px_max,
        |  CAST(CAST(SUM(luma) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
        |    AS mean_luma
        |FROM lum GROUP BY doc_id, w, h, ch ORDER BY doc_id""".stripMargin,
    // mm5b: index = ((doc_id*31 + i)*37) % 256, then the palette formulas
    // r=(idx*7+1)%256 g=(idx*11+3)%256 b=(idx*13+5)%256 reconstruct the
    // expanded truecolor plane — a hash match means inflate + indexed
    // unfilter + PLTE lookup recovered every pixel byte exactly.
    "mm5b_palette_stats" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    CAST(doc_id % 6 + 2 AS INT) AS w,
        |    CAST(doc_id % 4 + 2 AS INT) AS h
        |  FROM documents),
        |px AS (
        |  SELECT doc_id, w, h,
        |    ((doc_id*31 + unnest(range(0, CAST(w AS BIGINT) * h))) * 37) % 256 AS idx
        |  FROM p),
        |rgb AS (
        |  SELECT doc_id, w, h,
        |    (idx*7 + 1) % 256 AS c0,
        |    (idx*11 + 3) % 256 AS c1,
        |    (idx*13 + 5) % 256 AS c2
        |  FROM px),
        |lum AS (
        |  SELECT doc_id, w, h,
        |    (2126*c0 + 7152*c1 + 722*c2) // 10000 AS luma,
        |    LEAST(c0, c1, c2) AS mn, GREATEST(c0, c1, c2) AS mx
        |  FROM rgb)
        |SELECT doc_id, w AS width, h AS height, CAST(3 AS INT) AS channels,
        |  CAST(COUNT(*) AS BIGINT) AS n_pixels,
        |  CAST(SUM(luma) AS BIGINT) AS lum_sum,
        |  CAST(MIN(mn) AS INT) AS px_min, CAST(MAX(mx) AS INT) AS px_max,
        |  CAST(CAST(SUM(luma) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
        |    AS mean_luma
        |FROM lum GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin,
    // mm6b: decoded sample k = ((doc_id*131 + k)*9973) % 2^bits −
    // 2^(bits−1) with bits 8/24 by doc parity and channels decorrelated
    // via doc_id % 4; width-relative clip rails.
    "mm6b_wide_audio_stats" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    CAST((doc_id % 4) // 2 + 1 AS INT) AS ch,
        |    CAST(8000 + (doc_id % 3) * 4000 AS INT) AS rate,
        |    CAST(doc_id % 50 + 10 AS INT) AS frames,
        |    CAST(CASE WHEN doc_id % 2 = 0 THEN 8 ELSE 24 END AS INT) AS bits
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, ch, rate, frames, bits,
        |    ((doc_id*131 + unnest(range(0, CAST(frames AS BIGINT) * ch))) * 9973)
        |      % (CASE bits WHEN 8 THEN 256 ELSE 16777216 END)
        |      - (CASE bits WHEN 8 THEN 128 ELSE 8388608 END) AS v
        |  FROM p)
        |SELECT doc_id, ch AS channels, rate AS sample_rate, bits, frames,
        |  CAST(COUNT(*) AS BIGINT) AS n_samples,
        |  CAST(CAST(frames AS BIGINT) * 1000 // rate AS BIGINT) AS duration_ms,
        |  CAST(SUM(v*v) AS BIGINT) AS sum_sq,
        |  CAST(MAX(ABS(v)) AS INT) AS peak,
        |  CAST(SUM(CASE WHEN v = (CASE bits WHEN 8 THEN 127 ELSE 8388607 END)
        |             OR v = (CASE bits WHEN 8 THEN -128 ELSE -8388608 END)
        |           THEN 1 ELSE 0 END) AS BIGINT) AS clipped,
        |  sqrt(CAST(CAST(SUM(v*v) AS BIGINT) AS DOUBLE)
        |       / CAST(COUNT(*) AS DOUBLE)) AS rms
        |FROM s GROUP BY doc_id, ch, rate, frames, bits ORDER BY doc_id""".stripMargin,
    // mm5f: sample i of doc = ((doc_id*31 + i)*37) % 2^d with d cycling
    // 1/2/4; gray docs keep the raw value (BT.709 identity: luma = v),
    // palette docs route v through mm5b's triple formulas. bit_depth is
    // the decoded plane's: d for gray, 8 after palette expansion. The
    // oracle is layout-blind — the same SQL gates sequential AND Adam7
    // files (every fifth doc), so a hash match proves the packed-row
    // unfilter, MSB-first unpack, and per-pass packing geometry.
    "mm5f_subbyte_stats" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    CAST(doc_id % 6 + 2 AS INT) AS w,
        |    CAST(doc_id % 4 + 2 AS INT) AS h,
        |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 4 END AS d,
        |    doc_id % 2 = 0 AS gray
        |  FROM documents),
        |px AS (
        |  SELECT doc_id, w, h, d, gray,
        |    ((doc_id*31 + unnest(range(0, CAST(w AS BIGINT) * h))) * 37)
        |      % (CASE d WHEN 1 THEN 2 WHEN 2 THEN 4 ELSE 16 END) AS v
        |  FROM p),
        |rgb AS (
        |  SELECT doc_id, w, h, d, gray,
        |    CASE WHEN gray THEN v ELSE (v*7 + 1) % 256 END AS c0,
        |    CASE WHEN gray THEN v ELSE (v*11 + 3) % 256 END AS c1,
        |    CASE WHEN gray THEN v ELSE (v*13 + 5) % 256 END AS c2
        |  FROM px),
        |lum AS (
        |  SELECT doc_id, w, h, d, gray,
        |    (2126*c0 + 7152*c1 + 722*c2) // 10000 AS luma,
        |    LEAST(c0, c1, c2) AS mn, GREATEST(c0, c1, c2) AS mx
        |  FROM rgb)
        |SELECT doc_id, w AS width, h AS height,
        |  CAST(CASE WHEN gray THEN 1 ELSE 3 END AS INT) AS channels,
        |  CAST(CASE WHEN gray THEN d ELSE 8 END AS INT) AS bit_depth,
        |  CAST(COUNT(*) AS BIGINT) AS n_pixels,
        |  CAST(SUM(luma) AS BIGINT) AS lum_sum,
        |  CAST(MIN(mn) AS INT) AS px_min, CAST(MAX(mx) AS INT) AS px_max,
        |  CAST(CAST(SUM(luma) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
        |    AS mean_luma
        |FROM lum GROUP BY doc_id, w, h, d, gray ORDER BY doc_id""".stripMargin,
    "mm2_frame_sample" ->
      """WITH v AS (
        |  SELECT doc_id, unnest(range(0, (n_chars * 40 - 1) // 5000 + 1)) AS k
        |  FROM documents WHERE doc_id % 3 = 2 AND n_chars * 40 > 0)
        |SELECT doc_id, CAST(k AS INT) AS frame_idx,
        |  CAST(k * 5000 AS BIGINT) AS offset_ms
        |FROM v ORDER BY doc_id, frame_idx""".stripMargin
  )
}
