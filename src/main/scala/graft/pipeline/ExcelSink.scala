package graft.pipeline

import org.apache.spark.sql.DataFrame
import java.io.FileOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

/** K1: the reference's Excel sink (excel_builder.py:17-181) — a styled
  * workbook with a hidden "Lists" sheet feeding dropdown data validation on
  * the code columns — written with a dependency-free minimal OOXML writer
  * (no POI/spark-excel jar ships in this environment; .xlsx is a zip of
  * XML parts).
  *
  * Styling mirrors excel_builder.py:137-181: bold white-on-#366092 bordered
  * header row, `$#,##0.00` right-aligned currency columns, centered date
  * columns, auto-fit column widths capped at 50, frozen header row.
  *
  * Driver-side by design: the report is human-scale (the reference collects
  * into pandas before writing, excel_builder.py:54); large outputs belong in
  * Report.writeCsv / parquet. */
object ExcelSink {

  // cellXfs indices in styles.xml below
  private val StyleHeader = 1
  private val StyleCurrency = 2
  private val StyleCentered = 3

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  private[pipeline] def colRef(i: Int): String = {
    // 0-based column index → A, B, ..., Z, AA, ...
    var n = i + 1; val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  private def cellXml(ref: String, v: Any, style: Int): String = {
    val s = if (style == 0) "" else s""" s="$style""""
    v match {
      case null => ""
      case b: Boolean => s"""<c r="$ref"$s t="b"><v>${if (b) 1 else 0}</v></c>"""
      case n: Byte => s"""<c r="$ref"$s><v>$n</v></c>"""
      case n: Short => s"""<c r="$ref"$s><v>$n</v></c>"""
      case n: Int => s"""<c r="$ref"$s><v>$n</v></c>"""
      case n: Long => s"""<c r="$ref"$s><v>$n</v></c>"""
      case n: Float => s"""<c r="$ref"$s><v>$n</v></c>"""
      case n: Double => s"""<c r="$ref"$s><v>$n</v></c>"""
      case n: java.math.BigDecimal => s"""<c r="$ref"$s><v>${n.toPlainString}</v></c>"""
      case t => s"""<c r="$ref"$s t="inlineStr"><is><t>${esc(t.toString)}</t></is></c>"""
    }
  }

  private def rowXml(r: Int, cells: Seq[Any], styleOf: Int => Int): String =
    s"""<row r="$r">""" +
      cells.zipWithIndex.map { case (v, c) => cellXml(s"${colRef(c)}$r", v, styleOf(c)) }.mkString +
      "</row>"

  /** Schema order inside <worksheet> is fixed: sheetViews, cols, sheetData,
    * then dataValidations. `styleOf(row)(col)` picks the cellXfs index. */
  private def sheetXml(rows: Seq[Seq[Any]], validations: String = "",
                       colWidths: Seq[Double] = Seq.empty,
                       freezeHeader: Boolean = false,
                       styleOf: Int => Int => Int = _ => _ => 0): String = {
    val views =
      if (!freezeHeader) ""
      else """<sheetViews><sheetView workbookViewId="0">""" +
        """<pane ySplit="1" topLeftCell="A2" activePane="bottomLeft" state="frozen"/>""" +
        "</sheetView></sheetViews>"
    val cols =
      if (colWidths.isEmpty) ""
      else "<cols>" + colWidths.zipWithIndex.map { case (w, i) =>
        s"""<col min="${i + 1}" max="${i + 1}" width="$w" customWidth="1"/>"""
      }.mkString + "</cols>"
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
      views + cols + "<sheetData>" +
      rows.zipWithIndex.map { case (cells, i) => rowXml(i + 1, cells, styleOf(i)) }.mkString +
      "</sheetData>" + validations + "</worksheet>"
  }

  /** Fixed style table: header = bold white Arial 11 on #366092, thin
    * border, centered; currency = custom numFmt 164 `$#,##0.00`, right;
    * centered = plain font, horizontal center (excel_builder.py:139-165).
    * Fills 0/1 must stay none/gray125 — Excel reserves those slots. */
  private val stylesXml: String =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
      """<numFmts count="1"><numFmt numFmtId="164" formatCode="&quot;$&quot;#,##0.00"/></numFmts>""" +
      """<fonts count="2"><font><sz val="11"/><name val="Calibri"/></font>""" +
      """<font><b/><sz val="11"/><color rgb="FFFFFFFF"/><name val="Arial"/></font></fonts>""" +
      """<fills count="3"><fill><patternFill patternType="none"/></fill>""" +
      """<fill><patternFill patternType="gray125"/></fill>""" +
      """<fill><patternFill patternType="solid"><fgColor rgb="FF366092"/></patternFill></fill></fills>""" +
      """<borders count="2"><border><left/><right/><top/><bottom/><diagonal/></border>""" +
      """<border><left style="thin"/><right style="thin"/><top style="thin"/>""" +
      """<bottom style="thin"/><diagonal/></border></borders>""" +
      """<cellStyleXfs count="1"><xf numFmtId="0" fontId="0" fillId="0" borderId="0"/></cellStyleXfs>""" +
      """<cellXfs count="4">""" +
      """<xf numFmtId="0" fontId="0" fillId="0" borderId="0" xfId="0"/>""" +
      """<xf numFmtId="0" fontId="1" fillId="2" borderId="1" xfId="0" applyFont="1" applyFill="1" applyBorder="1" applyAlignment="1">""" +
      """<alignment horizontal="center" vertical="center"/></xf>""" +
      """<xf numFmtId="164" fontId="0" fillId="0" borderId="0" xfId="0" applyNumberFormat="1" applyAlignment="1">""" +
      """<alignment horizontal="right"/></xf>""" +
      """<xf numFmtId="0" fontId="0" fillId="0" borderId="0" xfId="0" applyAlignment="1">""" +
      """<alignment horizontal="center"/></xf>""" +
      "</cellXfs></styleSheet>"

  /** Write `df` (collected) as Transactions sheet; `dropdowns` maps report
    * column name → allowed display values, materialized on a hidden Lists
    * sheet and wired up as list data validation (excel_builder.py:104-135).
    * `currencyCols`/`centeredCols` select the `$#,##0.00` and centered body
    * styles the reference applies to Amount and Date. */
  def write(df: DataFrame, path: String, dropdowns: Map[String, Seq[String]] = Map.empty,
            currencyCols: Set[String] = Set.empty,
            centeredCols: Set[String] = Set.empty): Unit = {
    val headers = df.columns.toSeq
    val data = df.collect().map(_.toSeq).toSeq
    val nRows = data.size + 1

    // hidden Lists sheet: one column per dropdown, in header order
    val ddCols = headers.filter(dropdowns.contains)
    val listCols = ddCols.map(dropdowns)
    val maxLen = if (listCols.isEmpty) 0 else listCols.map(_.size).max
    val listRows = (0 until maxLen).map(r => listCols.map(c => if (r < c.size) c(r) else null))

    val validationXml =
      if (ddCols.isEmpty || data.isEmpty) "" // no data rows → sqref would be reversed (D2:D1)
      else s"""<dataValidations count="${ddCols.size}">""" + ddCols.zipWithIndex.map {
        case (name, di) =>
          val target = colRef(headers.indexOf(name))
          val listCol = colRef(di)
          s"""<dataValidation type="list" allowBlank="1" showDropDown="0" """ +
            s"""sqref="${target}2:$target$nRows">""" +
            s"""<formula1>Lists!$$$listCol$$1:$$$listCol$$${dropdowns(name).size}</formula1>""" +
            "</dataValidation>"
      }.mkString + "</dataValidations>"

    // auto-fit: width = min(max stringified length + 2, 50), as the
    // reference computes per column (excel_builder.py:167-177)
    val widths = headers.indices.map { c =>
      val lens = data.map(r => if (r(c) == null) 0 else r(c).toString.length)
      math.min((lens :+ headers(c).length).max + 2, 50).toDouble
    }

    val bodyStyle = headers.map {
      case h if currencyCols(h) => StyleCurrency
      case h if centeredCols(h) => StyleCentered
      case _ => 0
    }
    val styleOf: Int => Int => Int =
      row => if (row == 0) _ => StyleHeader else bodyStyle

    val parts: Seq[(String, String)] = Seq(
      "[Content_Types].xml" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
          """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
          """<Default Extension="xml" ContentType="application/xml"/>""" +
          """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
          """<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>""" +
          """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
          """<Override PartName="/xl/worksheets/sheet2.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
          "</Types>"),
      "_rels/.rels" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
          "</Relationships>"),
      "xl/workbook.xml" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" """ +
          """xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
          """<sheets><sheet name="Transactions" sheetId="1" r:id="rId1"/>""" +
          """<sheet name="Lists" sheetId="2" state="hidden" r:id="rId2"/></sheets></workbook>"""),
      "xl/_rels/workbook.xml.rels" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
          """<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>""" +
          """<Relationship Id="rId3" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>""" +
          "</Relationships>"),
      "xl/styles.xml" -> stylesXml,
      "xl/worksheets/sheet1.xml" ->
        sheetXml(headers +: data, validationXml, widths, freezeHeader = true, styleOf),
      "xl/worksheets/sheet2.xml" -> sheetXml(listRows))

    val zos = new ZipOutputStream(new FileOutputStream(path))
    try parts.foreach { case (name, content) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    } finally zos.close()
  }
}
