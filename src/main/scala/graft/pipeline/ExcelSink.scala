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
  * Driver-side by design: the report is human-scale (the reference collects
  * into pandas before writing, excel_builder.py:54); large outputs belong in
  * Report.writeCsv / parquet. */
object ExcelSink {

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  private[pipeline] def colRef(i: Int): String = {
    // 0-based column index → A, B, ..., Z, AA, ...
    var n = i + 1; val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  private def cellXml(ref: String, v: Any): String = v match {
    case null => ""
    case b: Boolean => s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
    case n: Byte => s"""<c r="$ref"><v>$n</v></c>"""
    case n: Short => s"""<c r="$ref"><v>$n</v></c>"""
    case n: Int => s"""<c r="$ref"><v>$n</v></c>"""
    case n: Long => s"""<c r="$ref"><v>$n</v></c>"""
    case n: Float => s"""<c r="$ref"><v>$n</v></c>"""
    case n: Double => s"""<c r="$ref"><v>$n</v></c>"""
    case n: java.math.BigDecimal => s"""<c r="$ref"><v>${n.toPlainString}</v></c>"""
    case s => s"""<c r="$ref" t="inlineStr"><is><t>${esc(s.toString)}</t></is></c>"""
  }

  private def rowXml(r: Int, cells: Seq[Any]): String =
    s"""<row r="$r">""" +
      cells.zipWithIndex.map { case (v, c) => cellXml(s"${colRef(c)}$r", v) }.mkString +
      "</row>"

  private def sheetXml(rows: Seq[Seq[Any]], validations: String = ""): String =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
      "<sheetData>" +
      rows.zipWithIndex.map { case (cells, i) => rowXml(i + 1, cells) }.mkString +
      "</sheetData>" + validations + "</worksheet>"

  /** Write `df` (collected) as Transactions sheet; `dropdowns` maps report
    * column name → allowed display values, materialized on a hidden Lists
    * sheet and wired up as list data validation (excel_builder.py:104-135). */
  def write(df: DataFrame, path: String, dropdowns: Map[String, Seq[String]] = Map.empty): Unit = {
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

    val parts: Seq[(String, String)] = Seq(
      "[Content_Types].xml" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
          """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
          """<Default Extension="xml" ContentType="application/xml"/>""" +
          """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
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
          "</Relationships>"),
      "xl/worksheets/sheet1.xml" -> sheetXml(headers +: data, validationXml),
      "xl/worksheets/sheet2.xml" -> sheetXml(listRows))

    val zos = new ZipOutputStream(new FileOutputStream(path))
    try parts.foreach { case (name, content) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    } finally zos.close()
  }
}
