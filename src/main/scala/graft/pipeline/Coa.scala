package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Chart-of-accounts table parsing (pdf_parser.py:406-512), over a ragged
  * cell-grid table `(file, page, table_idx, cells: array<array<string>>)`
  * (FIXTURES.md A2).
  *
  * Stages: header-keyword table-type classification (first 3 rows,
  * first-match-wins priority funder > gl > location > program > dept),
  * row explode, F7/F8 header/empty-cell drops, F9 per-type code-shape
  * validation, and A7 last-occurrence-wins dedup per (code_type, code) —
  * Python dict-overwrite semantics, ordered by (page, table_idx, row_idx). */
object Coa {

  /** Classify each table by scanning its first 3 rows for header keywords
    * (pdf_parser.py:439-465). Priority order matches the reference's
    * elif-chain; matching stops at the first qualifying row. */
  def classifyTables(tables: DataFrame): DataFrame = {
    val headRows = slice(col("cells"), 1, 3)
    val rowText = (row: org.apache.spark.sql.Column) =>
      upper(concat_ws(" ", transform(row, c => coalesce(c, lit("")))))
    // per-row type: the reference's keyword cascade
    val rowType = (row: org.apache.spark.sql.Column) => {
      val t = rowText(row)
      when(t.contains("FUNDER"), "funder")
        .when(t.contains("EXP CODE") || t.contains("GL CODE") ||
          (t.contains("EXP") && t.contains("CODE")), "gl")
        .when(t.contains("LOC CODE") || t.contains("LOCATION CODE") ||
          (t.contains("LOC") && t.contains("CODE")), "location")
        .when(t.contains("PROG CODE") || t.contains("PROGRAM CODE") ||
          (t.contains("PROG") && t.contains("CODE")), "program")
        .when(t.contains("DEPT CODE") || t.contains("DEPARTMENT CODE") ||
          (t.contains("DEPT") && t.contains("CODE")), "dept")
        .otherwise(null)
    }
    // first non-null row type among the first 3 rows (left fold keeps first)
    val tableType = aggregate(headRows, lit(null).cast("string"),
      (acc, row) => coalesce(acc, rowType(row)))
    tables.withColumn("code_type", tableType).filter(col("code_type").isNotNull)
  }

  /** Explode classified tables to validated (code_type, code, name) rows. */
  def parseRows(classified: DataFrame): DataFrame = {
    val shapeOk = when(col("code_type") === "funder", col("code").rlike("^\\d{4}$"))
      .when(col("code_type") === "gl", col("code").rlike("^\\d{5}$"))
      .when(col("code_type") === "location", col("code").rlike("^\\d{2}$"))
      .otherwise(col("code").rlike("^\\d+$"))
    classified
      .select(col("file"), col("page"), col("table_idx"), col("code_type"),
        posexplode(col("cells")).as(Seq("row_idx", "row")))
      .select(col("file"), col("page"), col("table_idx"), col("row_idx"), col("code_type"),
        trim(coalesce(element_at(col("row"), 1), lit(""))).as("code"),
        trim(coalesce(element_at(col("row"), 2), lit(""))).as("name"))
      .filter(col("code") =!= "" && col("name") =!= "")                    // F8
      .filter(!upper(col("code")).contains("CODE") &&
        !upper(col("name")).contains("CODE"))                              // F7
      .filter(shapeOk)                                                     // F9
  }

  /** A7: last occurrence wins per (code_type, code), in document order —
    * `file` included so multi-file input stays deterministic (the reference
    * reads one COA pdf; lexicographic file order generalizes it). */
  def dedupLastWins(rows: DataFrame): DataFrame = {
    val order = Window.partitionBy("code_type", "code")
      .orderBy(col("file").desc, col("page").desc, col("table_idx").desc, col("row_idx").desc)
    rows.withColumn("__rn", row_number().over(order))
      .filter(col("__rn") === 1)
      .select("code_type", "code", "name")
  }

  /** Full COA pipeline: ragged cell grids → five deduped code tables in one
    * DataFrame keyed by `code_type`. */
  def parse(tables: DataFrame): DataFrame =
    dedupLastWins(parseRows(classifyTables(tables)))
}
