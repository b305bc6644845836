package graft.pipeline

import graft.SparkSpec

object CoaSpec {
  case class T(file: String, page: Int, table_idx: Int, cells: Seq[Seq[String]])
}

/** COA table classification/validation/dedup (FIXTURES.md A2 cases). */
class CoaSpec extends SparkSpec {
  import spark.implicits._
  import CoaSpec.T

  val tables = Seq(
    T("coa.pdf", 1, 0, Seq(
      Seq("FUNDER CODE", "FUNDER NAME"),
      Seq("2001", "State Grant"),
      Seq("2002", "Federal Grant"),
      Seq("20", "Too Short"),         // fails ^\d{4}$
      Seq("ABCD", "Not Numeric"))),
    T("coa.pdf", 1, 1, Seq(
      Seq("GL CODE", "DESCRIPTION"),
      Seq("51000", "Office Supplies"),
      Seq(null, "Null Code"),          // F8
      Seq("52000", null),              // F8
      Seq("5100", "Four Digits"))),    // fails ^\d{5}$
    T("coa.pdf", 2, 0, Seq(
      Seq("LOC CODE", "LOCATION"),
      Seq("01", "Main Office"),
      Seq("1", "One Digit"))),         // fails ^\d{2}$
    T("coa.pdf", 2, 1, Seq(
      Seq("PROG CODE", "PROGRAM"),
      Seq("100", "Youth Program"))),
    T("coa.pdf", 3, 0, Seq(
      Seq("DEPT CODE", "DEPARTMENT"),
      Seq("200", "Administration"))),
    // later page re-defines gl 51000 → last wins (A7 dict-overwrite)
    T("coa.pdf", 3, 1, Seq(
      Seq("EXP CODE", "DESCRIPTION"),
      Seq("51000", "Office Supplies v2"))),
    // unknown header → whole table skipped
    T("coa.pdf", 4, 0, Seq(
      Seq("MYSTERY", "STUFF"),
      Seq("9999", "Should Not Appear"))))

  lazy val out = Coa.parse(tables.toDF())
    .collect().map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap

  test("classification routes each table to its code type") {
    assert(out(("funder", "2001")) === "State Grant")
    assert(out(("location", "01")) === "Main Office")
    assert(out(("program", "100")) === "Youth Program")
    assert(out(("dept", "200")) === "Administration")
  }

  test("shape validation drops malformed codes per type") {
    assert(!out.contains(("funder", "20")))
    assert(!out.contains(("funder", "ABCD")))
    assert(!out.contains(("gl", "5100")))
    assert(!out.contains(("location", "1")))
  }

  test("header rows, null cells, unknown tables are dropped") {
    assert(!out.keys.exists(_._2 == "FUNDER CODE"))
    assert(!out.contains(("gl", "52000")))
    assert(!out.values.exists(_ == "Should Not Appear"))
  }

  test("last occurrence wins on duplicate codes (dict-overwrite semantics)") {
    assert(out(("gl", "51000")) === "Office Supplies v2")
  }
}
