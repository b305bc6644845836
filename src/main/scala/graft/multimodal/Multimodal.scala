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

  /** A REAL GIF file skeleton: 89a signature, logical screen descriptor
    * with a global color table flagged and sized by `colorBits`
    * (1..8 — the colour-resolution AND GCT-size fields both carry
    * colorBits−1), the GCT itself (3·2^colorBits bytes), and the 0x3B
    * trailer — everything a header parser must walk, dims little-endian. */
  def gifHeader(w: Int, h: Int, colorBits: Int): Array[Byte] = {
    require(colorBits >= 1 && colorBits <= 8, "1..8 colour bits")
    def le2(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    val packed = 0x80 | ((colorBits - 1) << 4) | (colorBits - 1)
    "GIF89a".getBytes("ISO-8859-1") ++ le2(w) ++ le2(h) ++
      Array(packed.toByte, 0.toByte, 0.toByte) ++
      new Array[Byte](3 * (1 << colorBits)) ++ Array(0x3B.toByte)
  }

  /** A REAL BMP header: "BM" file header + 40-byte BITMAPINFOHEADER with
    * little-endian signed dims, planes = 1, and the given bit count —
    * no pixel data (header-only, like [[jpegHeader]]'s empty scan). */
  def bmpHeader(w: Int, h: Int, bpp: Int): Array[Byte] = {
    def le2(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le4(v: Int): Array[Byte] = le2(v & 0xffff) ++ le2((v >>> 16) & 0xffff)
    "BM".getBytes("ISO-8859-1") ++ le4(54) ++ le4(0) ++ le4(54) ++
      le4(40) ++ le4(w) ++ le4(h) ++ le2(1) ++ le2(bpp) ++
      new Array[Byte](24) // compression/size/resolution/palette fields zeroed
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
    * height, width), GIF via the 87a/89a signature + logical screen
    * descriptor (LITTLE-endian u16 dims — the opposite byte order of
    * PNG/JPEG; "bit depth" is the colour-resolution field, packed bits
    * 4-6 of byte 10, +1), and BMP via "BM" + a ≥40-byte
    * BITMAPINFOHEADER (little-endian i32 dims at 18/22 — top-down
    * negative-height files report |height|, the sample count; planes
    * must be 1 per the spec; "bit depth" is biBitCount at 28). Returns
    * None for truncated/alien bytes — contained per file, like the PDF
    * reader. */
  def imageMeta(content: Array[Byte]): Option[(String, Int, Int, Int)] = {
    def u2(i: Int): Int = ((content(i) & 0xff) << 8) | (content(i + 1) & 0xff)
    def u4(i: Int): Int = (u2(i) << 16) | u2(i + 2)
    def le2(i: Int): Int = (content(i) & 0xff) | ((content(i + 1) & 0xff) << 8)
    def le4(i: Int): Int = le2(i) | (le2(i + 2) << 16)
    if (content.length >= 25 &&
      (content(0) & 0xff) == 0x89 && content(1) == 'P' &&
      content(2) == 'N' && content(3) == 'G' &&
      new String(content, 12, 4, "ISO-8859-1") == "IHDR")
      Some(("png", u4(16), u4(20), content(24) & 0xff))
    else if (content.length >= 13 &&
      (new String(content, 0, 6, "ISO-8859-1") == "GIF87a" ||
        new String(content, 0, 6, "ISO-8859-1") == "GIF89a")) {
      val w = le2(6); val h = le2(8)
      if (w <= 0 || h <= 0) None
      else Some(("gif", w, h, ((content(10) >> 4) & 7) + 1))
    } else if (content.length >= 30 && content(0) == 'B' && content(1) == 'M') {
      // BITMAPINFOHEADER (or a longer V4/V5 header — size field ≥ 40)
      val dib = le4(14)
      val w = le4(18); val h = le4(22)
      val planes = le2(26); val bpp = le2(28)
      if (dib < 40 || w <= 0 || h == 0 || planes != 1 || bpp <= 0) None
      else Some(("bmp", w, math.abs(h), bpp))
    } else if (content.length >= 4 &&
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

  // ---- real PNG pixel decode (mm5) ---------------------------------------

  /** A fully decoded PNG: `pixels` is the unfiltered image plane in
    * scanline order — `width · height · channels` bytes at bitDepth 8,
    * twice that (big-endian u16 samples, PNG network byte order) at
    * bitDepth 16, and at sub-byte depths (1/2/4) one byte per sample
    * holding the raw unpacked 0..2^depth−1 value. */
  case class PngImage(width: Int, height: Int, colorType: Int,
                      channels: Int, pixels: Array[Byte], bitDepth: Int = 8)

  /** Samples per pixel for the non-palette 8-bit color types (PNG spec
    * §11.2.2): gray, RGB, gray+alpha, RGBA. */
  def pngChannels(colorType: Int): Int = colorType match {
    case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4
    case other => throw new IllegalArgumentException(s"color type $other")
  }

  /** Hard cap on decoded plane size — a hostile IHDR must not allocate. */
  private val maxPlaneBytes = 1 << 26

  /** REAL PNG pixel decode — not a stub: chunk walk with CRC verification,
    * IHDR parse, multi-IDAT zlib inflate (JDK Inflater — the same
    * primitive the PDF /FlateDecode path uses), the full PNG filter
    * family inversion (Sub/Up/Average/Paeth — REUSED from the
    * /DecodeParms predictor work, [[graft.sources.Pdf.pngUnfilter]]), and
    * — round 14 — PLTE palette expansion, 16-bit depth, and Adam7
    * de-interlacing.
    *
    * Supported — the FULL legal depth/color-type matrix of PNG §11.2.2
    * since round 15: 8- and 16-bit depths for color types 0/2/4/6 (16-bit
    * unfilters at bpp = channels·2, per the spec's
    * filters-operate-on-bytes rule, and keeps big-endian u16 samples in
    * the plane), color type 3 (palette — the dominant web-corpus
    * PNG shape: the index plane unfilters at bpp = 1, then each index
    * expands through the CRC-verified PLTE to an RGB plane, so downstream
    * stats see `channels = 3` truecolor), SUB-BYTE depths 1/2/4 for
    * grayscale and palette (round 15 — 1-bit B/W scans and 4-bit icons:
    * filters run on the PACKED scanline bytes at bpp = 1 per §7.2, rows
    * byte-padded, then samples unpack MSB-first to one byte each holding
    * the raw 0..2^depth−1 value), and BOTH interlace methods
    * (Adam7 = seven independently-filtered sub-images, empty passes
    * omitted, each unfiltered then scattered to its (x0 + i·dx, y0 + j·dy)
    * position — PNG §8.2; composes with sub-byte: each pass packs its own
    * rows). Refused per file (None — contained, the PDF-reader
    * discipline): any depth/color-type pair outside table 11.1 (e.g.
    * sub-byte RGB), PLTE on grayscale types
    * (spec violation, PNG §11.2.3), tRNS on alpha-carrying color types
    * (forbidden, §11.3.2), a tRNS longer than the palette or preceding
    * it, an index beyond the palette (spec: error), and every
    * malformation — bad CRC, truncated IDAT,
    * wrong inflated length, missing IEND, missing PLTE on ct = 3. */
  def decodePng(content: Array[Byte]): Option[PngImage] = try {
    def u4(i: Int): Long =
      ((content(i) & 0xffL) << 24) | ((content(i + 1) & 0xffL) << 16) |
        ((content(i + 2) & 0xffL) << 8) | (content(i + 3) & 0xffL)
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    if (content.length < 8 || !(0 until 8).forall(i => (content(i) & 0xff) == sig(i)))
      return None
    var i = 8
    var dims: Option[(Int, Int, Int, Int, Int)] = None
    val idat = new java.io.ByteArrayOutputStream()
    var sawIend = false
    var sawIdat = false
    var plte: Option[Array[Byte]] = None
    var trns: Option[Array[Byte]] = None
    var trnsBeforePlte = false
    while (!sawIend) {
      if (i + 8 > content.length) return None
      val len = u4(i)
      if (len < 0 || len > Int.MaxValue - 12 || i + 12 + len > content.length)
        return None // truncated chunk
      val typ = new String(content, i + 4, 4, "ISO-8859-1")
      val crc = new java.util.zip.CRC32()
      crc.update(content, i + 4, 4 + len.toInt)
      if (crc.getValue != u4(i + 8 + len.toInt)) return None // corrupt chunk
      typ match {
        case "IHDR" =>
          if (len != 13 || dims.isDefined) return None
          dims = Some((u4(i + 8).toInt, u4(i + 12).toInt,
            content(i + 16) & 0xff, content(i + 17) & 0xff,
            content(i + 20) & 0xff))
          // compression and filter methods must be 0 (the only defined ones)
          if ((content(i + 18) & 0xff) != 0 || (content(i + 19) & 0xff) != 0)
            return None
        case "PLTE" =>
          // single PLTE, before IDAT, 1-256 RGB triples (PNG §11.2.3)
          if (plte.isDefined || sawIdat || len == 0 || len % 3 != 0 || len > 768)
            return None
          plte = Some(java.util.Arrays.copyOfRange(content, i + 8, i + 8 + len.toInt))
        case "tRNS" =>
          if (trns.isDefined) return None // single tRNS (PNG §11.3.2)
          if (plte.isEmpty) trnsBeforePlte = true // must FOLLOW PLTE for ct 3
          trns = Some(java.util.Arrays.copyOfRange(content, i + 8, i + 8 + len.toInt))
        case "IDAT" => sawIdat = true; idat.write(content, i + 8, len.toInt)
        case "IEND" => sawIend = true
        case _ => () // ancillary chunks skipped by their declared length
      }
      i += 12 + len.toInt
    }
    val (w, h, depth, ct, interlace) = dims.getOrElse(return None)
    // legal depth/color-type combos (PNG §11.2.2, table 11.1): sub-byte
    // depths (1/2/4 — round 15) exist only for grayscale and palette
    val depthOk = ct match {
      case 0 => depth == 1 || depth == 2 || depth == 4 || depth == 8 || depth == 16
      case 3 => depth == 1 || depth == 2 || depth == 4 || depth == 8
      case 2 | 4 | 6 => depth == 8 || depth == 16
      case _ => return None
    }
    if (!depthOk) return None
    if (interlace != 0 && interlace != 1) return None // 0 = none, 1 = Adam7
    if (ct == 3 && plte.isEmpty) return None // palette decode needs the palette
    // ct 3 + tRNS = alpha palette (decoded to RGBA since round 14): the
    // chunk must follow PLTE and carry at most one alpha per entry
    if (ct == 3 && trns.exists(t => trnsBeforePlte || t.length > plte.get.length / 3))
      return None
    if ((ct == 4 || ct == 6) && trns.isDefined) return None // forbidden (spec §11.3.2)
    // ct 0/2 tRNS is a single transparent color — exactly 2 / 6 bytes
    // (§11.3.2); any other length is a malformation, refused like bad CRCs
    // (the value itself is irrelevant to the stats, which carry no alpha)
    if (ct == 0 && trns.exists(_.length != 2)) return None
    if (ct == 2 && trns.exists(_.length != 6)) return None
    if ((ct == 0 || ct == 4) && plte.isDefined) return None // PLTE forbidden (spec)
    if (w <= 0 || h <= 0 || !sawIdat) return None
    val ch = if (ct == 3) 1 else pngChannels(ct) // ct 3: 1 index byte/pixel
    // bytes per DECODED sample (sub-byte depths unpack to one byte each);
    // filters operate on BYTES: bpp = ch·bps at 8/16-bit, 1 at sub-byte
    // (§7.2: fewer than 8 bits per pixel rounds bpp up to one byte)
    val bps = math.max(1, depth / 8)
    val subByte = depth < 8
    // a PACKED scanline at sub-byte depth: w samples of `depth` bits,
    // MSB-first within each byte, rows padded to a byte boundary (§7.2 —
    // bits never carry across scanlines)
    def packedRow(width: Int): Long =
      if (subByte) (width.toLong * depth + 7) / 8 else width.toLong * ch * bps
    val filterBpp = if (subByte) 1 else ch * bps
    val rowBytes = packedRow(w)
    // Adam7 (PNG §8.2): seven sub-images at (x0, y0, dx, dy) offsets, each
    // filtered INDEPENDENTLY (its own scanlines, its own filter bytes);
    // empty passes are omitted from the stream entirely
    val passes: Seq[(Int, Int, Int, Int, Int, Int)] =
      if (interlace == 0) Seq.empty
      else adam7.flatMap { case (x0, y0, dx, dy) =>
        val wp = (w - x0 + dx - 1) / dx
        val hp = (h - y0 + dy - 1) / dy
        if (wp > 0 && hp > 0) Some((x0, y0, dx, dy, wp, hp)) else None
      }.toSeq
    val expected: Long =
      if (interlace == 0) h.toLong * (1L + rowBytes)
      else passes.map { case (_, _, _, _, wp, hp) =>
        hp.toLong * (1L + packedRow(wp)) }.sum
    // the palette expansion below allocates w·h·4 when a tRNS table rides
    // along (RGBA), so the cap must check the EXPANDED plane, not w·h·3
    val expandCh = if (ct == 3 && trns.isDefined) 4 else 3
    if (expected > maxPlaneBytes || w.toLong * h * expandCh > maxPlaneBytes) return None
    // inflate the concatenated IDAT stream to EXACTLY the expected length
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    val raw = new Array[Byte](expected.toInt)
    var got = 0
    while (got < raw.length && !inf.finished()) {
      val k = inf.inflate(raw, got, raw.length - got)
      if (k == 0 && inf.needsInput()) { inf.end(); return None } // truncated
      got += k
    }
    val over = inf.inflate(new Array[Byte](1)) // any surplus byte = wrong length
    inf.end()
    if (got != raw.length || over != 0) return None
    // sub-byte unpack: one output byte per sample, MSB-first extraction —
    // the exact inverse of the writer's packRows; applied AFTER the filter
    // inversion (filters see the packed bytes, §7.2)
    def unpackBits(packed: Array[Byte], rows: Int, width: Int): Array[Byte] = {
      val prb = ((width.toLong * depth + 7) / 8).toInt
      val mask = (1 << depth) - 1
      val out = new Array[Byte](rows * width)
      var r = 0
      while (r < rows) {
        var i = 0
        while (i < width) {
          val bit = i * depth
          out(r * width + i) =
            (((packed(r * prb + (bit >> 3)) & 0xff) >> (8 - depth - (bit & 7))) & mask).toByte
          i += 1
        }
        r += 1
      }
      out
    }
    val pixels: Array[Byte] =
      if (interlace == 0) {
        val up = graft.sources.Pdf.pngUnfilter(raw, bpp = filterBpp,
          rowBytes = rowBytes.toInt)
        if (up.length != h.toLong * rowBytes) return None
        val p = if (subByte) unpackBits(up, h, w) else up
        if (p.length != w.toLong * h * ch * bps) return None
        p
      } else {
        // per-pass unfilter (packed rows), then sub-byte unpack, then
        // scatter each pass pixel to its final (x0 + i·dx, y0 + j·dy)
        // position — the de-interlace
        val out = new Array[Byte](w * h * ch * bps)
        var off = 0
        passes.foreach { case (x0, y0, dx, dy, wp, hp) =>
          val prb = packedRow(wp).toInt
          val passLen = hp * (1 + prb)
          val upass = graft.sources.Pdf.pngUnfilter(
            java.util.Arrays.copyOfRange(raw, off, off + passLen),
            bpp = filterBpp, rowBytes = prb)
          if (upass.length != hp.toLong * prb) return None
          val sub = if (subByte) unpackBits(upass, hp, wp) else upass
          val unit = ch * bps
          var j = 0
          while (j < hp) {
            var i2 = 0
            while (i2 < wp) {
              System.arraycopy(sub, (j * wp + i2) * unit, out,
                ((y0 + j * dy) * w + (x0 + i2 * dx)) * unit, unit)
              i2 += 1
            }
            j += 1
          }
          off += passLen
        }
        out
      }
    if (ct != 3) return Some(PngImage(w, h, ct, ch, pixels, depth))
    // palette expansion: index plane -> RGB truecolor (or RGBA when a
    // tRNS alpha table rides along; entries past its end default to 255,
    // PNG §11.3.2)
    val pal = plte.get
    val nEntries = pal.length / 3
    val outCh = if (trns.isDefined) 4 else 3
    val rgb = new Array[Byte](w * h * outCh)
    var p = 0
    while (p < pixels.length) {
      val idx = pixels(p) & 0xff
      if (idx >= nEntries) return None // index beyond palette: spec error
      rgb(p * outCh) = pal(idx * 3)
      rgb(p * outCh + 1) = pal(idx * 3 + 1)
      rgb(p * outCh + 2) = pal(idx * 3 + 2)
      if (outCh == 4)
        rgb(p * outCh + 3) =
          trns.get.lift(idx).getOrElse(255.toByte)
      p += 1
    }
    Some(PngImage(w, h, ct, outCh, rgb))
  } catch { case _: Exception => None }

  /** Pixel statistics over a decoded plane: (n_pixels, integer luma sum,
    * channel min, channel max). Luma uses the ITU-R BT.709 coefficients as
    * EXACT integer arithmetic — (2126·R + 7152·G + 722·B) div 10000 — so
    * the aggregate is order-independent and the DuckDB twin replays it
    * bit-for-bit (for gray, the identity sums to 10000·v div 10000 = v).
    * Alpha channels are excluded from min/max and luma. At bitDepth 16 the
    * samples are big-endian u16 and the identical formula runs on the
    * 0..65535 range — no precision downshift. */
  def pngStats(img: PngImage): (Long, Long, Int, Int) = {
    val ch = img.channels
    // sub-byte planes carry one byte per sample (raw 0..2^depth−1 values)
    val bps = math.max(1, img.bitDepth / 8)
    val n = img.width * img.height
    def sample(idx: Int): Int =
      if (bps == 1) img.pixels(idx) & 0xff
      else ((img.pixels(idx * 2) & 0xff) << 8) | (img.pixels(idx * 2 + 1) & 0xff)
    var lumSum = 0L
    var mn = (1 << (img.bitDepth)) - 1
    var mx = 0
    var p = 0
    while (p < n) {
      val base = p * ch
      val c0 = sample(base)
      val (r, g, b) =
        if (ch >= 3) (c0, sample(base + 1), sample(base + 2))
        else (c0, c0, c0)
      lumSum += (2126L * r + 7152L * g + 722L * b) / 10000L
      mn = math.min(mn, math.min(r, math.min(g, b)))
      mx = math.max(mx, math.max(r, math.max(g, b)))
      p += 1
    }
    (n.toLong, lumSum, mn, mx)
  }

  /** A real PNG WRITER for the synthetic image table and the specs —
    * forward-filters each row with tag = row % 5 (so a decode genuinely
    * exercises Sub/Up/Average/Paeth inversion, not just None), deflates,
    * and splits the stream across TWO IDAT chunks (multi-IDAT concat is
    * part of the format). For `colorType = 3` pass the INDEX plane as
    * `pixels` (1 byte/pixel) and the RGB-triple table as `palette` — a
    * PLTE chunk lands between IHDR and IDAT per the spec's ordering. */
  def encodePng(w: Int, h: Int, colorType: Int, pixels: Array[Byte],
                palette: Option[Array[Byte]] = None): Array[Byte] =
    encodePngDepth(w, h, colorType, 8, pixels, palette)

  /** 16-bit writer: packs each 0..65535 sample big-endian (PNG network
    * byte order) and runs the same filter/deflate/chunk core. */
  def encodePng16(w: Int, h: Int, colorType: Int, samples: Array[Int]): Array[Byte] = {
    val plane = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      plane(i * 2) = ((samples(i) >> 8) & 0xff).toByte
      plane(i * 2 + 1) = (samples(i) & 0xff).toByte
      i += 1
    }
    encodePngDepth(w, h, colorType, 16, plane, None)
  }

  /** Adam7 pass grid (PNG §8.2): (x0, y0, dx, dy) per pass. */
  private[multimodal] val adam7 = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** Adam7 writer: splits the plane into the seven sub-images, filters
    * each pass independently (tag = pass-local row % 5, filter neighbors
    * INSIDE the pass — the spec's rule), concatenates, and runs the same
    * deflate/chunk tail with interlace = 1. 8-bit planes directly; pass a
    * 16-bit plane by pre-packing (as [[encodePng16]] does) with bps folded
    * into pixels. At sub-byte depths (1/2/4 — round 15) `pixels` is one
    * byte per sample and each pass's gathered sub-image is bit-packed
    * per §7.2 (rows padded per PASS, not per image) before filtering at
    * bpp = 1. */
  def encodePngAdam7(w: Int, h: Int, colorType: Int, pixels: Array[Byte],
                     palette: Option[Array[Byte]] = None,
                     depth: Int = 8): Array[Byte] = {
    val subByte = depth < 8
    val ch =
      if (subByte) 1
      else (if (colorType == 3) 1 else pngChannels(colorType)) * (depth / 8)
    require(pixels.length == w * h * ch, s"plane must be ${w * h * ch} bytes")
    val buf = new java.io.ByteArrayOutputStream()
    adam7.foreach { case (x0, y0, dx, dy) =>
      val wp = (w - x0 + dx - 1) / dx
      val hp = (h - y0 + dy - 1) / dy
      if (wp > 0 && hp > 0) {
        // gather the pass's sub-image, then filter it like a tiny PNG
        val sub = new Array[Byte](wp * hp * ch)
        var j = 0
        while (j < hp) {
          var i = 0
          while (i < wp) {
            System.arraycopy(pixels, ((y0 + j * dy) * w + (x0 + i * dx)) * ch,
              sub, (j * wp + i) * ch, ch)
            i += 1
          }
          j += 1
        }
        if (subByte)
          buf.write(filterPlane(packRows(sub, hp, wp, depth), hp,
            (wp * depth + 7) / 8, 1))
        else
          buf.write(filterPlane(sub, hp, wp * ch, ch))
      }
    }
    finishPng(w, h, colorType, depth, buf.toByteArray, palette, interlace = 1)
  }

  /** Pack one-byte-per-sample rows into sub-byte scanlines: `depth` bits
    * per sample, MSB-first within each byte, each row padded to a byte
    * boundary (PNG §7.2) — the writer-side inverse of the decoder's
    * unpackBits. */
  private def packRows(samples: Array[Byte], rows: Int, width: Int,
                       depth: Int): Array[Byte] = {
    val prb = (width * depth + 7) / 8
    val mask = (1 << depth) - 1
    val out = new Array[Byte](rows * prb)
    var r = 0
    while (r < rows) {
      var i = 0
      while (i < width) {
        val bit = i * depth
        out(r * prb + (bit >> 3)) = (out(r * prb + (bit >> 3)) |
          ((samples(r * width + i) & mask) << (8 - depth - (bit & 7)))).toByte
        i += 1
      }
      r += 1
    }
    out
  }

  /** Sub-byte writer (depths 1/2/4, color types 0 and 3): `samples` is one
    * byte per sample (values < 2^depth); rows are packed MSB-first, then
    * filtered at bpp = 1 (§7.2) through the same per-row-varying filter
    * family and two-IDAT tail as the 8-bit writer. */
  def encodePngSubByte(w: Int, h: Int, colorType: Int, depth: Int,
                       samples: Array[Byte],
                       palette: Option[Array[Byte]] = None): Array[Byte] = {
    require(depth == 1 || depth == 2 || depth == 4, "sub-byte depths only")
    require(colorType == 0 || colorType == 3, "sub-byte: gray or palette")
    require(colorType != 3 || palette.exists(p => p.nonEmpty && p.length % 3 == 0),
      "colorType 3 needs a non-empty RGB-triple palette")
    require(samples.length == w * h, s"plane must be ${w * h} samples")
    val packed = packRows(samples, h, w, depth)
    val prb = (w * depth + 7) / 8
    finishPng(w, h, colorType, depth, filterPlane(packed, h, prb, 1),
      palette, interlace = 0)
  }

  /** Alpha-palette writer: PLTE + tRNS between IHDR and IDAT. */
  def encodePngAlphaPalette(w: Int, h: Int, indices: Array[Byte],
                            palette: Array[Byte],
                            trns: Array[Byte]): Array[Byte] = {
    require(palette.nonEmpty && palette.length % 3 == 0 &&
      trns.length <= palette.length / 3, "alpha table exceeds palette")
    require(indices.length == w * h, s"index plane must be ${w * h} bytes")
    finishPng(w, h, 3, 8, filterPlane(indices, h, w, 1), Some(palette),
      interlace = 0, trns = Some(trns))
  }

  private def encodePngDepth(w: Int, h: Int, colorType: Int, depth: Int,
                             pixels: Array[Byte],
                             palette: Option[Array[Byte]]): Array[Byte] = {
    val bps = depth / 8
    val ch = (if (colorType == 3) 1 else pngChannels(colorType)) * bps
    require(colorType != 3 || palette.exists(p => p.nonEmpty && p.length % 3 == 0),
      "colorType 3 needs a non-empty RGB-triple palette")
    require(pixels.length == w * h * ch, s"plane must be ${w * h * ch} bytes")
    finishPng(w, h, colorType, depth, filterPlane(pixels, h, w * ch, ch),
      palette, interlace = 0)
  }

  /** Forward-filter a contiguous plane: `rows` scanlines of `rowBytes`
    * bytes, filter tag = row % 5 (every inversion exercised), byte-level
    * neighbors at distance `bpp`. */
  private def filterPlane(pixels: Array[Byte], rows: Int, rowBytes: Int,
                          bpp: Int): Array[Byte] = {
    val raw = new Array[Byte](rows * (1 + rowBytes))
    var r = 0
    while (r < rows) {
      val tag = r % 5
      raw(r * (1 + rowBytes)) = tag.toByte
      var i = 0
      while (i < rowBytes) {
        val x = pixels(r * rowBytes + i) & 0xff
        val a = if (i >= bpp) pixels(r * rowBytes + i - bpp) & 0xff else 0
        val b = if (r > 0) pixels((r - 1) * rowBytes + i) & 0xff else 0
        val c = if (r > 0 && i >= bpp) pixels((r - 1) * rowBytes + i - bpp) & 0xff else 0
        val enc = tag match {
          case 0 => x
          case 1 => x - a
          case 2 => x - b
          case 3 => x - (a + b) / 2
          case _ => x - graft.sources.Pdf.paeth(a, b, c)
        }
        raw(r * (1 + rowBytes) + 1 + i) = enc.toByte
        i += 1
      }
      r += 1
    }
    raw
  }

  /** Deflate the filtered stream and assemble signature + IHDR [+ PLTE] +
    * two IDATs + IEND. */
  private def finishPng(w: Int, h: Int, colorType: Int, depth: Int,
                        raw: Array[Byte], palette: Option[Array[Byte]],
                        interlace: Int,
                        trns: Option[Array[Byte]] = None): Array[Byte] = {
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val zbuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!defl.finished()) zbuf.write(tmp, 0, defl.deflate(tmp))
    defl.end()
    val z = zbuf.toByteArray
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val td = typ.getBytes("ISO-8859-1") ++ data
      val crc = new java.util.zip.CRC32()
      crc.update(td)
      be4(data.length) ++ td ++ be4(crc.getValue.toInt)
    }
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val ihdr = be4(w) ++ be4(h) ++
      Array[Byte](depth.toByte, colorType.toByte, 0, 0, interlace.toByte)
    val plte = if (colorType == 3) chunk("PLTE", palette.get) else Array.empty[Byte]
    val tr = trns.map(chunk("tRNS", _)).getOrElse(Array.empty[Byte])
    val (z1, z2) = z.splitAt(math.max(1, z.length / 2))
    sig ++ chunk("IHDR", ihdr) ++ plte ++ tr ++ chunk("IDAT", z1) ++ chunk("IDAT", z2) ++
      chunk("IEND", Array.empty)
  }

  // ---- real WAV/PCM audio decode (mm6) -----------------------------------

  /** A fully decoded PCM WAV: interleaved signed samples in frame order
    * (`frames · channels` values), widened to Int. 16/24-bit carry their
    * two's-complement value; 8-bit PCM is UNSIGNED on disk (RIFF's one
    * endianness quirk: midpoint 128) and is centered to −128..127 at
    * decode so every width shares the signed stats frame. */
  case class WavAudio(channels: Int, sampleRate: Int, frames: Int,
                      samples: Array[Int], bits: Int = 16)

  /** Dependency-free WAV (RIFF) decode — NOT a stub: the audio twin of
    * [[decodePng]]. Walks the RIFF chunk list ("RIFF" size "WAVE", then
    * even-aligned chunks — a chunk with an odd payload is followed by a
    * pad byte, RIFF §2), requires ONE `fmt ` chunk BEFORE the one `data`
    * chunk, and accepts the canonical LPCM shapes: format tag 1 (or
    * WAVE_FORMAT_EXTENSIBLE 0xFFFE with the PCM sub-format GUID), 8-, 16-
    * or 24-bit samples (round 15 widened from 16-only — 24-bit LPCM and
    * 8-bit unsigned PCM are the common speech-corpus widths), 1–8
    * channels, a positive sample rate, and a data size that is a whole
    * number of frames whose declared block alignment matches
    * channels·(bits/8). Multi-byte samples are little-endian signed (the
    * RIFF byte order — note the OPPOSITE endianness of PNG's network
    * order); 8-bit is unsigned per the spec and centered by −128 so the
    * BIGINT-exact stats discipline holds at every width. Everything
    * else — truncation, float32 (format tag 3: samples are IEEE floats,
    * so an exact integer power sum would need a documented quantization
    * rule; refused rather than approximated), ADPCM, a data chunk before
    * fmt, size lies — returns None: contained per file, the PDF-reader
    * discipline. */
  def decodeWav(content: Array[Byte]): Option[WavAudio] = try {
    def u2(i: Int): Int = (content(i) & 0xff) | ((content(i + 1) & 0xff) << 8)
    def u4(i: Int): Long = (u2(i) & 0xffffL) | ((u2(i + 2) & 0xffffL) << 16)
    def tag(i: Int): String = new String(content, i, 4, "ISO-8859-1")
    if (content.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    val riffEnd = {
      val declared = 8L + u4(4)
      if (declared > content.length) return None // size lie: truncated
      declared.toInt
    }
    var i = 12
    var fmt: Option[(Int, Int, Int, Int, Int)] = None // tag, ch, rate, align, bits
    var data: Option[(Int, Int)] = None // offset, length
    while (i + 8 <= riffEnd) {
      val typ = tag(i)
      val len = u4(i + 4)
      if (len > Int.MaxValue - 8 || i + 8 + len > riffEnd) return None
      typ match {
        case "fmt " =>
          if (fmt.isDefined || len < 16) return None
          // payload layout (RIFF fmt): tag@0 ch@2 rate@4 byteRate@8
          // align@12 bits@14 [cbSize@16 validBits@18 mask@20 GUID@24]
          fmt = Some((u2(i + 8), u2(i + 10), u4(i + 12).toInt, u2(i + 20),
            u2(i + 22)))
          // WAVE_FORMAT_EXTENSIBLE: the real format lives in the 16-byte
          // sub-format GUID; accept only KSDATAFORMAT_SUBTYPE_PCM
          if (u2(i + 8) == 0xFFFE) {
            if (len < 40 || u2(i + 24) < 22) return None
            val guidPcm = Array(0x01, 0x00, 0x00, 0x00, 0x00, 0x00, 0x10,
              0x00, 0x80, 0x00, 0x00, 0xAA, 0x00, 0x38, 0x9B, 0x71)
            if (!(0 until 16).forall(k =>
              (content(i + 32 + k) & 0xff) == guidPcm(k))) return None
            fmt = fmt.map { case (_, ch, r, al, b) => (1, ch, r, al, b) }
          }
        case "data" =>
          if (data.isDefined) return None
          if (fmt.isEmpty) return None // data before fmt: malformed
          data = Some((i + 8, len.toInt))
        case _ => () // LIST/INFO/fact/cue chunks skipped by length
      }
      i += 8 + len.toInt + (len.toInt & 1) // odd chunks carry a pad byte
    }
    val (ftag, ch, rate, align, bits) = fmt.getOrElse(return None)
    val (off, dlen) = data.getOrElse(return None)
    if (ftag != 1) return None // float/ADPCM: refused
    if (bits != 8 && bits != 16 && bits != 24) return None
    if (ch < 1 || ch > 8 || rate <= 0) return None
    val bytesPer = bits / 8
    if (align != ch * bytesPer) return None // block align must match LPCM layout
    if (dlen % align != 0) return None // partial trailing frame: refused
    val n = dlen / bytesPer
    val samples = new Array[Int](n)
    var k = 0
    while (k < n) {
      samples(k) = bits match {
        case 8 => (content(off + k) & 0xff) - 128 // unsigned on disk, centered
        case 16 => ((content(off + k * 2) & 0xff) |
          ((content(off + k * 2 + 1) & 0xff) << 8)).toShort.toInt
        case _ => // 24-bit LE two's complement: sign-extend via << 8 >> 8
          ((content(off + k * 3) & 0xff) |
            ((content(off + k * 3 + 1) & 0xff) << 8) |
            ((content(off + k * 3 + 2) & 0xff) << 16)) << 8 >> 8
      }
      k += 1
    }
    Some(WavAudio(ch, rate, n / ch, samples, bits))
  } catch { case _: Exception => None }

  /** Audio statistics over decoded PCM: (n_samples, exact integer
    * sum-of-squares, peak absolute amplitude, clipped-sample count). The
    * power sum is BIGINT-exact at every width (max |s| = 2²³ at 24-bit ⇒
    * s² ≤ 2⁴⁶; 2¹⁷ samples before overflow even then), so the aggregate is
    * order-independent and the DuckDB twin replays it bit-for-bit — RMS
    * derives as one double division downstream, the moment-statistics
    * discipline (a22). Clip rails are width-relative: ±(2^(bits−1)) — for
    * centered 8-bit that is −128/127, the disk values 0/255. */
  def wavStats(a: WavAudio): (Long, Long, Int, Long) = {
    val hi = (1 << (a.bits - 1)) - 1
    val lo = -(1 << (a.bits - 1))
    var sumSq = 0L
    var peak = 0
    var clipped = 0L
    var k = 0
    while (k < a.samples.length) {
      val s = a.samples(k)
      sumSq += s.toLong * s
      val abs = math.abs(s)
      if (abs > peak) peak = abs
      if (s == hi || s == lo) clipped += 1
      k += 1
    }
    (a.samples.length.toLong, sumSq, peak, clipped)
  }

  /** A real WAV WRITER for the synthetic audio table and the specs:
    * canonical RIFF/WAVE with an INFO LIST chunk between fmt and data (so
    * a decode genuinely walks chunks rather than assuming the 44-byte
    * canonical layout) and an odd-sized comment chunk exercising the RIFF
    * pad-byte rule. 16-bit; [[encodeWavBits]] is the width-general form. */
  def encodeWav(channels: Int, sampleRate: Int, samples: Array[Short]): Array[Byte] =
    encodeWavBits(channels, sampleRate, 16, samples.map(_.toInt))

  /** Width-general LPCM writer (8/16/24-bit): `samples` carry the DECODED
    * (signed, centered) values; 8-bit re-biases by +128 to the spec's
    * unsigned disk form, multi-byte widths serialize little-endian. Same
    * LIST/pad chunk layout as [[encodeWav]]. */
  def encodeWavBits(channels: Int, sampleRate: Int, bits: Int,
                    samples: Array[Int]): Array[Byte] = {
    require(samples.length % channels == 0, "whole frames only")
    require(bits == 8 || bits == 16 || bits == 24, "LPCM widths only")
    def le2(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le4(v: Int): Array[Byte] = le2(v & 0xffff) ++ le2((v >>> 16) & 0xffff)
    val bytesPer = bits / 8
    val align = channels * bytesPer
    val fmt = "fmt ".getBytes("ISO-8859-1") ++ le4(16) ++
      le2(1) ++ le2(channels) ++ le4(sampleRate) ++
      le4(sampleRate * align) ++ le2(align) ++ le2(bits)
    // odd-length LIST payload: the pad byte after it is part of the format
    val info = "LIST".getBytes("ISO-8859-1") ++ le4(9) ++
      "INFOICMT!".getBytes("ISO-8859-1") ++ Array[Byte](0)
    val dataBytes = new Array[Byte](samples.length * bytesPer)
    var k = 0
    while (k < samples.length) {
      bits match {
        case 8 => dataBytes(k) = ((samples(k) + 128) & 0xff).toByte
        case 16 =>
          dataBytes(k * 2) = (samples(k) & 0xff).toByte
          dataBytes(k * 2 + 1) = ((samples(k) >> 8) & 0xff).toByte
        case _ =>
          dataBytes(k * 3) = (samples(k) & 0xff).toByte
          dataBytes(k * 3 + 1) = ((samples(k) >> 8) & 0xff).toByte
          dataBytes(k * 3 + 2) = ((samples(k) >> 16) & 0xff).toByte
      }
      k += 1
    }
    val data = "data".getBytes("ISO-8859-1") ++ le4(dataBytes.length) ++ dataBytes
    val body = "WAVE".getBytes("ISO-8859-1") ++ fmt ++ info ++ data
    "RIFF".getBytes("ISO-8859-1") ++ le4(body.length) ++ body
  }

  // ---- real MP4/ISOBMFF container metadata (mm7) -------------------------

  /** Parsed MP4 container metadata: major brand, movie timescale +
    * duration (mvhd), and per-track presentation sizes (tkhd, 16.16 fixed
    * → integer pixels). */
  case class Mp4Meta(brand: String, timescale: Long, duration: Long,
                     nTracks: Int, maxWidth: Int, maxHeight: Int)

  /** Dependency-free MP4 (ISO/IEC 14496-12 ISOBMFF) metadata — NOT a
    * stub: the video-container analog of [[imageMeta]]'s marker walk. A
    * box is [size:u32be][type:4cc][payload]; size == 1 switches to a
    * 64-bit largesize (handled), size == 0 ("to end of file") is refused
    * like other open-ended shapes. The walk skips unknown boxes by their
    * declared size, descends into the `moov` container, reads `mvhd`
    * (version 0 and 1 layouts — the 64-bit times shift timescale/duration
    * offsets), and collects every `trak`→`tkhd` presentation size (again
    * both versions; width/height are 16.16 fixed point, truncated to
    * integer pixels). Requires exactly one moov with one mvhd; truncated
    * boxes, size lies, or a missing/duplicated mvhd return None —
    * contained per file, the PDF-reader discipline. */
  /** Big-endian u32/u64 and 4cc readers + the ISOBMFF box-list walk,
    * shared by [[mp4Meta]] and [[mp4Tracks]]: a box is
    * [size:u32be][type:4cc][payload]; size == 1 switches to a 64-bit
    * largesize, size == 0 ("to end of file") is refused like other
    * open-ended shapes. `f(type, payloadFrom, payloadTo)` per box;
    * returns false on any framing violation. */
  private def beU4(c: Array[Byte], i: Int): Long =
    ((c(i) & 0xffL) << 24) | ((c(i + 1) & 0xffL) << 16) |
      ((c(i + 2) & 0xffL) << 8) | (c(i + 3) & 0xffL)
  private def beU8(c: Array[Byte], i: Int): Long = (beU4(c, i) << 32) | beU4(c, i + 4)
  private def fourcc(c: Array[Byte], i: Int): String =
    new String(c, i, 4, "ISO-8859-1")
  private def walkBoxes(c: Array[Byte], from: Int, to: Int)
                       (f: (String, Int, Int) => Boolean): Boolean = {
    var i = from
    while (i < to) {
      if (i + 8 > to) return false
      var size = beU4(c, i)
      var hdr = 8
      if (size == 1) { // 64-bit largesize
        if (i + 16 > to) return false
        size = beU8(c, i + 8); hdr = 16
      }
      if (size == 0 || size < hdr || i + size > to) return false
      if (!f(fourcc(c, i + 4), i + hdr, (i + size).toInt)) return false
      i += size.toInt
    }
    true
  }

  def mp4Meta(content: Array[Byte]): Option[Mp4Meta] = try {
    def u4(i: Int): Long = beU4(content, i)
    def u8(i: Int): Long = beU8(content, i)
    def tag(i: Int): String = fourcc(content, i)
    def walk(from: Int, to: Int)(f: (String, Int, Int) => Boolean): Boolean =
      walkBoxes(content, from, to)(f)
    if (content.length < 8) return None
    var brand: Option[String] = None
    var mvhd: Option[(Long, Long)] = None
    var tracks = List.empty[(Int, Int)]
    val ok = walk(0, content.length) { (typ, from, to) =>
      typ match {
        case "ftyp" =>
          if (brand.isDefined || to - from < 8) false
          else { brand = Some(tag(from)); true }
        case "moov" =>
          walk(from, to) { (t2, f2, to2) =>
            t2 match {
              case "mvhd" =>
                if (mvhd.isDefined || to2 - f2 < 4) false
                else {
                  val v = content(f2) & 0xff
                  // v0: ver/flags(4) ctime(4) mtime(4) ts(4) dur(4)
                  // v1: ver/flags(4) ctime(8) mtime(8) ts(4) dur(8)
                  if (v == 0 && to2 - f2 >= 20) {
                    mvhd = Some((u4(f2 + 12), u4(f2 + 16))); true
                  } else if (v == 1 && to2 - f2 >= 32) {
                    mvhd = Some((u4(f2 + 20), u8(f2 + 24))); true
                  } else false
                }
              case "trak" =>
                walk(f2, to2) { (t3, f3, to3) =>
                  t3 match {
                    case "tkhd" =>
                      val v = content(f3) & 0xff
                      // width/height are the LAST 8 payload bytes (16.16
                      // fixed), after the version-dependent time fields,
                      // ids, and the 36-byte matrix
                      val need = if (v == 0) 84 else 96
                      if (to3 - f3 < need) false
                      else {
                        val wOff = f3 + need - 8
                        tracks = ((u4(wOff) >> 16).toInt,
                          (u4(wOff + 4) >> 16).toInt) :: tracks
                        true
                      }
                    case _ => true // mdia/edts etc. skipped
                  }
                }
              case _ => true // udta/iods etc. skipped
            }
          }
        case _ => true // free/mdat/skip boxes skipped by declared size
      }
    }
    if (!ok) return None
    val b = brand.getOrElse(return None)
    val (ts, dur) = mvhd.getOrElse(return None)
    if (ts <= 0) return None
    val (mw, mh) =
      if (tracks.isEmpty) (0, 0)
      else (tracks.map(_._1).max, tracks.map(_._2).max)
    Some(Mp4Meta(b, ts, dur, tracks.length, mw, mh))
  } catch { case _: Exception => None }

  /** One parsed ISOBMFF track: identity and presentation size from tkhd,
    * media timescale/duration from the trak's mdhd, the handler 4cc
    * ("vide"/"soun"/…) from hdlr, and the first sample-entry format 4cc
    * (the codec — "avc1", "mp4a", …) from stbl/stsd — the columns a
    * video-corpus filter actually keys on ("keep h264 video ≥ 720p"). */
  case class Mp4Track(trackId: Long, width: Int, height: Int,
                      handler: String, codec: String,
                      mediaTimescale: Long, mediaDuration: Long)

  /** Per-track ISOBMFF metadata (round-15 VERDICT #5) — descends
    * moov→trak→{tkhd, mdia→{mdhd, hdlr, minf→stbl→stsd}}, both version-0
    * and version-1 layouts for tkhd/mdhd (64-bit times shift every later
    * offset). Each trak must carry exactly one tkhd and one mdia with one
    * mdhd, one hdlr, and one stsd with ≥ 1 entry; a missing or duplicated
    * box, a zero media timescale, or any framing violation refuses the
    * FILE (None — the per-file containment discipline; partial track
    * lists would silently under-report a corpus filter's matches).
    * Tracks return in file order. */
  def mp4Tracks(content: Array[Byte]): Option[Seq[Mp4Track]] = try {
    if (content.length < 8) return None
    var sawMoov = false
    var bad = false
    val tracks = scala.collection.mutable.ListBuffer.empty[Mp4Track]
    val ok = walkBoxes(content, 0, content.length) { (typ, from, to) =>
      typ match {
        case "moov" =>
          if (sawMoov) false
          else {
            sawMoov = true
            walkBoxes(content, from, to) { (t2, f2, to2) =>
              t2 match {
                case "trak" =>
                  // per-trak fields, all required exactly once
                  var tkhd: Option[(Long, Int, Int)] = None
                  var mdhd: Option[(Long, Long)] = None
                  var hdlr: Option[String] = None
                  var codec: Option[String] = None
                  val wok = walkBoxes(content, f2, to2) { (t3, f3, to3) =>
                    t3 match {
                      case "tkhd" =>
                        val v = content(f3) & 0xff
                        val need = if (v == 0) 84 else 96
                        if (tkhd.isDefined || to3 - f3 < need) false
                        else {
                          // track_id follows ver/flags + 2 times (4+4+4
                          // at v0; 4+8+8 at v1); width/height are the
                          // last 8 payload bytes (16.16 fixed)
                          val idOff = f3 + (if (v == 0) 12 else 20)
                          val wOff = f3 + need - 8
                          tkhd = Some((beU4(content, idOff),
                            (beU4(content, wOff) >> 16).toInt,
                            (beU4(content, wOff + 4) >> 16).toInt))
                          true
                        }
                      case "mdia" =>
                        walkBoxes(content, f3, to3) { (t4, f4, to4) =>
                          t4 match {
                            case "mdhd" =>
                              val v = content(f4) & 0xff
                              // v0: ver/flags(4) ctime(4) mtime(4) ts(4)
                              // dur(4); v1: ver/flags(4) ctime(8) mtime(8)
                              // ts(4) dur(8)
                              if (mdhd.isDefined) false
                              else if (v == 0 && to4 - f4 >= 20) {
                                mdhd = Some((beU4(content, f4 + 12),
                                  beU4(content, f4 + 16))); true
                              } else if (v == 1 && to4 - f4 >= 32) {
                                mdhd = Some((beU4(content, f4 + 20),
                                  beU8(content, f4 + 24))); true
                              } else false
                            case "hdlr" =>
                              // ver/flags(4) pre_defined(4) handler(4cc)
                              if (hdlr.isDefined || to4 - f4 < 12) false
                              else { hdlr = Some(fourcc(content, f4 + 8)); true }
                            case "minf" =>
                              walkBoxes(content, f4, to4) { (t5, f5, to5) =>
                                t5 match {
                                  case "stbl" =>
                                    walkBoxes(content, f5, to5) { (t6, f6, to6) =>
                                      t6 match {
                                        case "stsd" =>
                                          // ver/flags(4) entry_count(4)
                                          // entry: size(4) format(4cc)
                                          if (codec.isDefined || to6 - f6 < 16 ||
                                            beU4(content, f6 + 4) < 1) false
                                          else {
                                            codec = Some(fourcc(content, f6 + 12))
                                            true
                                          }
                                        case _ => true // stts/stsc/... skipped
                                      }
                                    }
                                  case _ => true // vmhd/smhd/dinf skipped
                                }
                              }
                            case _ => true // edts etc. skipped
                          }
                        }
                      case _ => true
                    }
                  }
                  if (!wok) false
                  else (tkhd, mdhd, hdlr, codec) match {
                    case (Some((id, w, h)), Some((ts, dur)), Some(hd), Some(cc))
                      if ts > 0 =>
                      tracks += Mp4Track(id, w, h, hd, cc, ts, dur); true
                    case _ => bad = true; false // incomplete track: refuse file
                  }
                case _ => true // mvhd/udta skipped (mp4Meta's concern)
              }
            }
          }
        case _ => true // ftyp/free/mdat skipped by declared size
      }
    }
    if (!ok || bad || !sawMoov) None else Some(tracks.toList)
  } catch { case _: Exception => None }

  /** A real ISOBMFF WRITER for the synthetic video table and the specs:
    * ftyp + a free box (so the walk genuinely skips), moov{mvhd + udta +
    * trak{tkhd}×n} with a version-1 mvhd every third file (64-bit
    * duration path) and an empty mdat tail. */
  def encodeMp4(brand: String, timescale: Long, duration: Long,
                tracks: Seq[(Int, Int)], v1Mvhd: Boolean = false): Array[Byte] = {
    require(brand.length == 4, "4cc brand")
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be4(payload.length + 8) ++ typ.getBytes("ISO-8859-1") ++ payload
    def be8(v: Long): Array[Byte] = be4((v >> 32).toInt) ++ be4(v.toInt)
    val ftyp = box("ftyp", brand.getBytes("ISO-8859-1") ++ be4(0) ++
      "isom".getBytes("ISO-8859-1"))
    val free = box("free", Array.fill[Byte](5)(0x20))
    val mvhd =
      if (v1Mvhd)
        box("mvhd", Array[Byte](1, 0, 0, 0) ++ be8(0) ++ be8(0) ++
          be4(timescale.toInt) ++ be8(duration) ++ Array.fill[Byte](80)(0))
      else
        box("mvhd", Array[Byte](0, 0, 0, 0) ++ be4(0) ++ be4(0) ++
          be4(timescale.toInt) ++ be4(duration.toInt) ++ Array.fill[Byte](80)(0))
    val udta = box("udta", box("name", "graft".getBytes("ISO-8859-1")))
    val traks = tracks.map { case (w, h) =>
      val tkhd = box("tkhd", Array[Byte](0, 0, 0, 7) ++ be4(0) ++ be4(0) ++
        be4(1) ++ be4(0) ++ be4(duration.toInt) ++ Array.fill[Byte](8)(0) ++
        Array.fill[Byte](8)(0) ++ Array.fill[Byte](36)(0) ++
        be4(w << 16) ++ be4(h << 16))
      box("trak", tkhd)
    }
    val moov = box("moov", mvhd ++ udta ++ traks.flatten.toArray)
    val mdat = box("mdat", Array.empty[Byte])
    ftyp ++ free ++ moov ++ mdat
  }

  /** Full-track ISOBMFF writer: like [[encodeMp4]] but every trak carries
    * the complete media hierarchy — tkhd (with a real track_id) + mdia{
    * mdhd, hdlr, minf{stbl{stsd{one sample entry}}}} — so [[mp4Tracks]]
    * must genuinely descend four container levels. `v1` switches tkhd AND
    * mdhd to their version-1 (64-bit-time) layouts. */
  def encodeMp4WithTracks(brand: String, timescale: Long, duration: Long,
                          tracks: Seq[Mp4Track],
                          v1: Boolean = false): Array[Byte] = {
    require(brand.length == 4, "4cc brand")
    require(tracks.forall(t => t.handler.length == 4 && t.codec.length == 4),
      "4cc handler/codec")
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be4(payload.length + 8) ++ typ.getBytes("ISO-8859-1") ++ payload
    def be8(v: Long): Array[Byte] = be4((v >> 32).toInt) ++ be4(v.toInt)
    val ftyp = box("ftyp", brand.getBytes("ISO-8859-1") ++ be4(0) ++
      "isom".getBytes("ISO-8859-1"))
    val free = box("free", Array.fill[Byte](5)(0x20))
    val mvhd =
      if (v1)
        box("mvhd", Array[Byte](1, 0, 0, 0) ++ be8(0) ++ be8(0) ++
          be4(timescale.toInt) ++ be8(duration) ++ Array.fill[Byte](80)(0))
      else
        box("mvhd", Array[Byte](0, 0, 0, 0) ++ be4(0) ++ be4(0) ++
          be4(timescale.toInt) ++ be4(duration.toInt) ++ Array.fill[Byte](80)(0))
    val traks = tracks.map { t =>
      val tail = Array.fill[Byte](8)(0) ++ Array.fill[Byte](8)(0) ++
        Array.fill[Byte](36)(0) ++ be4(t.width << 16) ++ be4(t.height << 16)
      val tkhd =
        if (v1) box("tkhd", Array[Byte](1, 0, 0, 7) ++ be8(0) ++ be8(0) ++
          be4(t.trackId.toInt) ++ be4(0) ++ be8(duration) ++ tail)
        else box("tkhd", Array[Byte](0, 0, 0, 7) ++ be4(0) ++ be4(0) ++
          be4(t.trackId.toInt) ++ be4(0) ++ be4(duration.toInt) ++ tail)
      val mdhd = // trailing language/pre_defined (4 bytes) per the spec
        if (v1) box("mdhd", Array[Byte](1, 0, 0, 0) ++ be8(0) ++ be8(0) ++
          be4(t.mediaTimescale.toInt) ++ be8(t.mediaDuration) ++
          Array[Byte](0, 0, 0, 0))
        else box("mdhd", Array[Byte](0, 0, 0, 0) ++ be4(0) ++ be4(0) ++
          be4(t.mediaTimescale.toInt) ++ be4(t.mediaDuration.toInt) ++
          Array[Byte](0, 0, 0, 0))
      val hdlr = box("hdlr", Array[Byte](0, 0, 0, 0) ++ be4(0) ++
        t.handler.getBytes("ISO-8859-1") ++ Array.fill[Byte](12)(0) ++
        Array[Byte](0)) // empty null-terminated name
      // one minimal sample entry: size(4) format(4cc) reserved(6) dref(2)
      val entry = be4(16) ++ t.codec.getBytes("ISO-8859-1") ++
        Array.fill[Byte](6)(0) ++ Array[Byte](0, 1)
      val stsd = box("stsd", Array[Byte](0, 0, 0, 0) ++ be4(1) ++ entry)
      val mdia = box("mdia", mdhd ++ hdlr ++ box("minf", box("stbl", stsd)))
      box("trak", tkhd ++ mdia)
    }
    val moov = box("moov", mvhd ++
      box("udta", box("name", "graft".getBytes("ISO-8859-1"))) ++
      traks.flatten.toArray)
    ftyp ++ free ++ moov ++ box("mdat", Array.empty[Byte])
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
