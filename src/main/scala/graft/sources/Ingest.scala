package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingestion sources (SURVEY.md §2.1 S1/S2/S7/S8, §2.9).
  *
  * The reference's two ingest paths map to:
  *  - S1 glob scan (main.py:65-69): `binaryFile` with recursive glob;
  *  - S2/S3 PDF extraction (pdf_parser.py:90-158, 419-434): a pluggable
  *    bytes→words table function over the binary scan. The default
  *    dispatches real PDFs to the dependency-free [[Pdf]] reader and
  *    anything else to a deterministic text stub (FIXTURES.md word tables);
  *  - S7/S8 IMAP landing (email_fetcher.py:21-98): a streaming `binaryFile`
  *    source over a landing dir with month partitioning (K3) and
  *    already-landed dedup (F13) — exactly-once via checkpoint + anti-join.
  */
object Ingest {

  /** S1: recursive glob scan of a document drop directory. Each row carries
    * (path, modificationTime, length, content). At 100 TB this is a
    * file-listing-parallel scan; no content is read until acted on. */
  def binaryScan(spark: SparkSession, dir: String, glob: String = "*.pdf"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(dir)

  /** S7 streaming twin: new files appearing under the landing dir become
    * micro-batch rows; checkpointing makes the landing exactly-once. */
  def binaryStream(spark: SparkSession, dir: String, glob: String = "*.pdf"): DataFrame =
    spark.readStream.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .schema(StructType(Seq(
        StructField("path", StringType),
        StructField("modificationTime", TimestampType),
        StructField("length", LongType),
        StructField("content", BinaryType))))
      .load(dir)

  /** The word-table contract (FIXTURES.md A1): file → positioned words.
    * A real deployment drops in a pdfplumber-equivalent here. */
  type WordExtractor = (String, Array[Byte]) => Iterator[(String, Int, String, Double, Double, Double, Double)]

  /** Deterministic stub extractor: treats content as whitespace-separated
    * text, one page, words laid out left-to-right — enough to drive the
    * Statement pipeline end-to-end through the binary path. */
  val stubExtractor: WordExtractor = (path, content) => {
    val words = new String(content, "UTF-8").split("\\s+").filter(_.nonEmpty)
    words.iterator.zipWithIndex.map { case (w, i) =>
      val row = i / 8
      val colIdx = i % 8
      (path, 1, w, colIdx * 70.0, colIdx * 70.0 + 60.0, 100.0 + row * 15.0, 110.0 + row * 15.0)
    }
  }

  /** Default extractor: dispatch by CONTENT, not filename. Anything opening
    * with the `%PDF` magic goes through the real reader
    * ([[Pdf.wordExtractor]], contained per-file failure); everything else —
    * including a text fixture merely NAMED `.pdf` — falls back to the
    * deterministic text stub. So `binaryScan → extractWords →
    * Statement.parse` is real end-to-end with no caller knowledge, and the
    * dispatch can't be fooled by a mislabeled file in either direction. */
  val defaultExtractor: WordExtractor = (path, content) => {
    val isPdf = content.length >= 4 && content(0) == '%' &&
      content(1) == 'P' && content(2) == 'D' && content(3) == 'F'
    if (isPdf) Pdf.wordExtractor(path, content)
    else stubExtractor(path, content)
  }

  /** S2: binary scan → word table via a generator (flatMap) — the UDTF slot.
    * Partition-parallel: each file is decoded where its bytes land. */
  def extractWords(files: DataFrame, extractor: WordExtractor = defaultExtractor): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, c) => extractor(p, c) }
      .toDF("file", "page", "text", "x0", "x1", "top", "bottom")
  }

  /** S8/K3: month-partitioned landing layout (email_fetcher.py:71-74). */
  def withMonthPartition(files: DataFrame): DataFrame =
    files.withColumn("month", date_format(col("modificationTime"), "yyyy-MM"))

  /** F13: already-downloaded dedup — drop incoming files whose filename is
    * in the landed manifest (email_fetcher.py:86-90), as a left anti join. */
  def dedupAgainstManifest(incoming: DataFrame, manifest: DataFrame): DataFrame = {
    val named = incoming.withColumn("filename", element_at(split(col("path"), "/"), -1))
    named.join(broadcast(manifest.select(col("filename"))), Seq("filename"), "left_anti")
  }

  /** F11: statement-email subject filter (email_fetcher.py:49-56) over a
    * mail-metadata frame `(subject, from, received, ...)`. */
  def statementSubjectFilter(mail: DataFrame): DataFrame =
    mail.filter(lower(col("subject")).rlike("statement|credit card|mastercard"))

  /** F12: server-side date+sender predicate (email_fetcher.py:38-44):
    * last `days` days, from the bank domain. `asOf` is explicit — the
    * engine never embeds wall-clock now() in a lazy plan. */
  def recentFromBank(mail: DataFrame, asOf: java.sql.Timestamp, days: Int = 30,
                     senderDomain: String = "wellsfargo.com"): DataFrame =
    mail.filter(col("received") >= date_sub(lit(asOf).cast("date"), days) &&
      col("from").contains(senderDomain))
}
