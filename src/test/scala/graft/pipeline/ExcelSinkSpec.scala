package graft.pipeline

import graft.SparkSpec
import java.util.zip.ZipFile
import scala.jdk.CollectionConverters._

class ExcelSinkSpec extends SparkSpec {
  import spark.implicits._

  def readEntry(zf: ZipFile, name: String): String = {
    val is = zf.getInputStream(zf.getEntry(name))
    try new String(is.readAllBytes(), "UTF-8") finally is.close()
  }

  lazy val path: String = {
    val p = java.nio.file.Files.createTempDirectory("xlsx").resolve("report.xlsx").toString
    val report = Seq(
      ("01/03", "AMAZON MKTPL", 39.12, "51000", false),
      ("01/05", "REFUND <&> VENDOR", -15.0, "", false)
    ).toDF("Date", "Vendor", "Amount", "GL_Account", "Receipt_Received")
    ExcelSink.write(report, p, dropdowns = Map(
      "GL_Account" -> Seq("51000 - Office Supplies", "52000 - Travel")),
      currencyCols = Set("Amount"), centeredCols = Set("Date"))
    p
  }

  test("produces a structurally valid xlsx package") {
    val zf = new ZipFile(path)
    try {
      val names = zf.entries().asScala.map(_.getName).toSet
      assert(names === Set("[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
        "xl/_rels/workbook.xml.rels", "xl/styles.xml",
        "xl/worksheets/sheet1.xml", "xl/worksheets/sheet2.xml"))
      // python zipfile/openpyxl-style consumers need well-formed XML; check parse
      names.foreach { n =>
        scala.xml.XML.loadString(readEntry(zf, n))
      }
    } finally zf.close()
  }

  test("report sheet carries headers, typed cells, and escaped strings") {
    val zf = new ZipFile(path)
    try {
      val s1 = readEntry(zf, "xl/worksheets/sheet1.xml")
      assert(s1.contains("<is><t>Date</t></is>"))
      assert(s1.contains("<v>39.12</v>"))
      assert(s1.contains("""t="b""""))
      assert(s1.contains("REFUND &lt;&amp;&gt; VENDOR"))
    } finally zf.close()
  }

  test("styles part round-trips: header/currency/centered styles, widths, freeze") {
    val zf = new ZipFile(path)
    try {
      val styles = scala.xml.XML.loadString(readEntry(zf, "xl/styles.xml"))
      // currency numFmt exists and cellXfs wires the four styles
      assert((styles \\ "numFmt").exists(n =>
        (n \@ "numFmtId") == "164" && (n \@ "formatCode").contains("#,##0.00")))
      assert((styles \\ "cellXfs" \ "xf").size === 4)
      assert((styles \\ "fill" \ "patternFill" \ "fgColor").exists(_ \@ "rgb" == "FF366092"))
      assert((styles \\ "border" \ "left").exists(_ \@ "style" == "thin"))

      val s1 = scala.xml.XML.loadString(readEntry(zf, "xl/worksheets/sheet1.xml"))
      // header row cells carry the header style; Amount (col C) body cells
      // the currency style; Date (col A) body cells the centered style
      val cells = s1 \\ "c"
      def styleAt(ref: String) = cells.find(_ \@ "r" == ref).map(_ \@ "s")
      assert(styleAt("A1") === Some("1") && styleAt("E1") === Some("1"))
      assert(styleAt("C2") === Some("2") && styleAt("C3") === Some("2"))
      assert(styleAt("A2") === Some("3"))
      assert(styleAt("B2") === Some(""))
      // auto-fit widths: one <col> per column, header-or-data max + 2
      val cols = s1 \\ "col"
      assert(cols.size === 5)
      // Vendor (B): longest value "REFUND <&> VENDOR" (17) + 2
      assert(cols.find(_ \@ "min" == "2").map(_ \@ "width") === Some("19.0"))
      // frozen header pane
      assert((s1 \\ "pane").exists(p =>
        (p \@ "ySplit") == "1" && (p \@ "state") == "frozen" && (p \@ "topLeftCell") == "A2"))
      // the hidden Lists sheet stays unstyled
      val s2 = readEntry(zf, "xl/worksheets/sheet2.xml")
      assert(!s2.contains("<cols>") && !s2.contains(" s=\""))
    } finally zf.close()
  }

  test("dropdown validation references the hidden Lists sheet (K1 contract)") {
    val zf = new ZipFile(path)
    try {
      val s1 = readEntry(zf, "xl/worksheets/sheet1.xml")
      val s2 = readEntry(zf, "xl/worksheets/sheet2.xml")
      val wb = readEntry(zf, "xl/workbook.xml")
      assert(s1.contains("""<dataValidation type="list""""))
      assert(s1.contains("<formula1>Lists!$A$1:$A$2</formula1>"))
      assert(s1.contains("""sqref="D2:D3""""))  // GL_Account is column D, 2 data rows
      assert(s2.contains("51000 - Office Supplies"))
      assert(wb.contains("""state="hidden""""))
    } finally zf.close()
  }
}
