package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The reference's statement-parsing dataflow (pdf_parser.py:90-395),
  * re-expressed as one lazy Catalyst plan over a positional word table
  * `(file, page, text, x0, x1, top, bottom)` — the output of any PDF word
  * extractor (FIXTURES.md A1). Every stage is a pure DataFrame → DataFrame
  * function; nothing materializes until the caller acts.
  *
  * Scale: everything below is partitioned by (file, page) — millions of
  * statements parallelize perfectly; the only shuffles are the per-page
  * window/groupBy stages, all on the same (file, page) key, which Spark
  * reuses across stages (one exchange).
  */
object Statement {

  val mmdd = "^\\d{2}/\\d{2}$"
  val amountShape = "^[\\d,]+\\.\\d{2}$"

  /** F1: keep only pages whose text mentions "Transaction Details"
    * (pdf_parser.py:108-110) — the cheap page predicate that prunes whole
    * pages before any row parsing. */
  def detailPages(words: DataFrame): DataFrame = {
    val pageText = words.groupBy("file", "page")
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("top"), col("x0"), col("text")))),
          w => w.getField("text"))).as("page_text"))
      .filter(col("page_text").contains("Transaction Details"))
      .select("file", "page")
    words.join(pageText, Seq("file", "page"), "left_semi")
  }

  /** J4+A3: per-page credit/charge column threshold — the `Credits`/`Charges`
    * header words on the same line (|Δtop| < 2, charges right of credits);
    * threshold = midpoint of their right edges (pdf_parser.py:137-146,
    * 195-203). A band self-join confined to header words. */
  def pageThresholds(words: DataFrame): DataFrame = {
    val cred = words.filter(col("text") === "Credits")
      .select(col("file"), col("page"), col("x1").as("cred_x1"), col("top").as("cred_top"))
    val chg = words.filter(col("text") === "Charges")
      .select(col("file").as("f2"), col("page").as("p2"), col("x1").as("chg_x1"),
        col("top").as("chg_top"))
    cred.join(chg,
        col("file") === col("f2") && col("page") === col("p2") &&
        abs(col("cred_top") - col("chg_top")) < 2 && col("chg_x1") > col("cred_x1"))
      .groupBy("file", "page")
      // reference takes the first pair in word-scan order (pdf_parser.py:
      // 137-146); min(struct) = topmost-leftmost pair, deterministically
      .agg(min(struct(col("cred_top"), col("cred_x1"), col("chg_x1"))).as("m"))
      .select(col("file"), col("page"),
        ((col("m.cred_x1") + col("m.chg_x1")) / 2).as("column_threshold"))
  }

  /** J5+A4: per-page header row — the first `Trans` word confirmed by `Post`
    * and `Reference` on the same line (pdf_parser.py:205-226). */
  def pageHeaderTops(words: DataFrame): DataFrame = {
    val trans = words.filter(col("text") === "Trans")
      .select(col("file"), col("page"), col("top").as("t_top"))
    val post = words.filter(col("text") === "Post")
      .select(col("file").as("f2"), col("page").as("p2"), col("top").as("p_top"))
    val ref = words.filter(col("text") === "Reference")
      .select(col("file").as("f3"), col("page").as("p3"), col("top").as("r_top"))
    trans
      .join(post, col("file") === col("f2") && col("page") === col("p2") &&
        abs(col("t_top") - col("p_top")) < 2)
      .join(ref, col("file") === col("f3") && col("page") === col("p3") &&
        abs(col("t_top") - col("r_top")) < 2)
      .groupBy("file", "page").agg(min("t_top").as("header_top"))
  }

  case class ClusterWord(file: String, page: Int, text: String,
                         x0: Double, x1: Double, top: Double)
  case class ClusteredRow(file: String, page: Int, row_id: Long,
                          ws: Seq[(Double, String, Double)], row_top: Double)

  /** A1: spatial row clustering — sort words by (top, x0) within a page; a
    * word joins the current row while `|top − anchor| < 3` where the anchor
    * is the **row's first word** (pdf_parser.py:267-276: `current_top` is
    * set when a row opens and never updated). Anchor semantics are NOT
    * expressible as a lag window — a lag formulation lets slow vertical
    * drift chain-merge rows the reference splits — so this is a per-page
    * greedy fold (`flatMapGroups`), which still parallelizes perfectly:
    * one task per hash bucket of pages, bounded words per page. */
  def clusterRows(words: DataFrame): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    words.select(col("file"), col("page").cast("int").as("page"), col("text"),
        col("x0").cast("double"), col("x1").cast("double"), col("top").cast("double"))
      // a real word extractor always provides text+coords; defensively drop
      // incomplete words rather than crash the typed encoder on nulls
      .na.drop(Seq("file", "page", "text", "x0", "x1", "top"))
      .as[ClusterWord]
      .groupByKey(w => (w.file, w.page))
      .flatMapGroups { (key: (String, Int), it: Iterator[ClusterWord]) =>
        val (file, page) = key
        val ws = it.toArray.sortBy(w => (w.top, w.x0))
        val rows = Seq.newBuilder[ClusteredRow]
        var rowId = 1L
        var start = 0
        var anchor = if (ws.nonEmpty) ws(0).top else 0.0
        def emit(endExclusive: Int): Unit = {
          val row = ws.slice(start, endExclusive)
          // rows inherit the page's (top, x0) sort — the reference never
          // re-sorts within a row (pdf_parser.py:264 sorts once, rows are
          // scan-order slices), and _parse_row's positional logic consumes
          // THAT order; an x0 re-sort would accept rows the reference
          // rejects when jitter puts a word slightly above the dates
          rows += ClusteredRow(file, page, rowId,
            row.map(w => (w.x0, w.text, w.x1)).toSeq,
            row.map(_.top).min)
        }
        var i = 1
        while (i < ws.length) {
          if (math.abs(ws(i).top - anchor) >= 3) {
            emit(i); rowId += 1; start = i; anchor = ws(i).top
          }
          i += 1
        }
        if (ws.nonEmpty) emit(ws.length)
        rows.result()
      }
      .toDF("file", "page", "row_id", "ws", "row_top")
      .withColumn("ws", col("ws").cast(
        "array<struct<x0:double,text:string,x1:double>>"))
  }

  /** P1/F2-F6/W1/P2/P3/A2: clustered row → transaction projection
    * (pdf_parser.py:283-395). `ws` is the x0-sorted word array:
    *  - arity ≥ 4 (F2), words[0] and words[1] shaped MM/DD (F3);
    *  - rightmost amount-shaped word = amount (W1, right-to-left argmax);
    *  - vendor/description = words[3..amountIdx) joined (P1/A2);
    *  - drop "PAYMENT THANK YOU" rows (F5) and descriptions < 3 chars (F6);
    *  - strip $/, and cast (P2); negate credits left of the threshold (P3). */
  def parseRows(rows: DataFrame, thresholds: DataFrame): DataFrame = {
    val texts = transform(col("ws"), w => w.getField("text"))
    val n = size(col("ws"))
    // W1: rightmost index (1-based) whose text is amount-shaped, scanning
    // candidates ≥ 3 like the reference (pdf_parser.py:346-350 scans
    // 0-based i ≥ 2); the left fold keeps the highest matching index.
    // Guarded on arity: Catalyst may evaluate this fused with other
    // predicates before the n ≥ 4 filter, and sequence(3, 2) would run
    // DESCENDING into an out-of-bounds element_at.
    val amtIdx = when(n >= 3,
      aggregate(
        sequence(lit(3), n), lit(0),
        (acc, i) => when(element_at(texts, i).rlike(amountShape), i).otherwise(acc))
    ).otherwise(lit(0))

    rows
      .join(thresholds, Seq("file", "page"), "inner")
      .filter(n >= 4)                                  // F2
      .filter(element_at(texts, 1).rlike(mmdd) && element_at(texts, 2).rlike(mmdd)) // F3
      .withColumn("amt_idx", amtIdx)
      .filter(col("amt_idx") >= 5)  // F4: found AND ≥ 4 0-based (pdf_parser.py:367-368)
      .withColumn("post_date", element_at(texts, 2))
      .withColumn("description",
        concat_ws(" ", slice(texts, lit(4), greatest(col("amt_idx") - 4, lit(0)))))
      .filter(!upper(col("description")).contains("PAYMENT THANK YOU")) // F5
      .filter(length(col("description")) >= 3)         // F6
      .withColumn("amount_raw",
        regexp_replace(element_at(texts, col("amt_idx")), "[$,]", "").cast("decimal(12,2)"))
      .filter(col("amount_raw").isNotNull)             // P2 null-safe parse
      .withColumn("amount_x1",
        element_at(transform(col("ws"), w => w.getField("x1")), col("amt_idx")))
      .withColumn("amount",                            // P3 credit negation
        when(col("amount_x1") < col("column_threshold"), -col("amount_raw"))
          .otherwise(col("amount_raw")))
      .select(col("file"), col("page"), col("row_id"),
        col("post_date").as("date"), col("description").as("vendor"),
        col("amount"), col("description"))
  }

  /** SURVEY.md §7.4: the reference keeps `MM/DD` strings and never resolves
    * the year. Parity keeps strings; this opt-in enrichment derives a real
    * DateType given the statement year (statement-period boundary rule:
    * December dates on a January statement belong to `year - 1`). */
  def withResolvedDates(txns: DataFrame, statementYear: Int, statementMonth: Int): DataFrame = {
    val mm = split(col("date"), "/").getItem(0).cast("int")
    val yr = when(mm > statementMonth, lit(statementYear - 1)).otherwise(lit(statementYear))
    txns.withColumn("date_resolved",
      to_date(concat_ws("-", yr, format_string("%02d", mm),
        split(col("date"), "/").getItem(1))))
  }

  /** A6 empty-input guard (main.py:108-112): fail fast with the reference's
    * abort semantics instead of writing an empty report. */
  def requireTransactions(txns: DataFrame): DataFrame = {
    if (txns.isEmpty)
      throw new IllegalStateException(
        "No transactions found — check input statements (main.py:108-112 semantics)")
    txns
  }

  /** The full pipeline: words → transactions (one lazy plan, §3.1).
    * The header-buffer filter (F10, pdf_parser.py:259-260) drops words at or
    * above `header_top + 5` *before* clustering, like the reference. */
  def parse(words: DataFrame): DataFrame = {
    val pages = detailPages(words)
    val dataWords = pages.join(pageHeaderTops(pages), Seq("file", "page"))
      .filter(col("top") > col("header_top") + 5)
      .drop("header_top")
    parseRows(clusterRows(dataWords), pageThresholds(pages))
  }
}
