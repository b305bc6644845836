package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The dependency-free SQLite reader against a committed fixture written by
  * the stock sqlite3 library (tools/make_sqlite_fixture.py): 1KB pages so
  * the 301-row table spans interior b-tree pages, one >8KB row exercising
  * the overflow chain, and a typetest table covering every record serial
  * type. Closes S4/S5 (database.py:40-124) for real: the final test runs
  * the reference's exact→fuzzy vendor enrichment with the dim sourced from
  * the .db file. */
class SqliteSpec extends SparkSpec {
  import spark.implicits._

  val db = "src/test/resources/fixtures/vendor_mappings.db"

  test("lists user tables, hides sqlite internals and indexes") {
    assert(Sqlite.tables(db).toSet === Set("vendor_mappings", "typetest"))
  }

  test("reads the reference-schema dim across interior pages: counts, rowids, values") {
    val vm = Sqlite.readTable(spark, db, "vendor_mappings")
    assert(vm.columns.toSeq === Seq("id", "vendor", "gl_account", "location",
      "program", "funder", "department", "created_at", "updated_at"))
    assert(vm.count() === 301)
    // INTEGER PRIMARY KEY = rowid alias: dense 1..301 from AUTOINCREMENT
    val ids = vm.select("id").as[Long].collect().sorted
    assert(ids.head === 1L && ids.last === 301L && ids.distinct.length === 301)
    val r43 = vm.filter($"id" === 44).collect().head // i = 43 inserted as id 44
    assert(r43.getAs[String]("vendor") === "Vendor 043 Inc")
    assert(r43.getAs[String]("gl_account") === "6710") // 43 % 9 = 7
    assert(r43.getAs[String]("location") === "LOC3")   // 43 % 5 = 3
    assert(r43.getAs[String]("program") === "PROG1")   // 43 % 3 = 1
    assert(r43.getAs[String]("created_at") === "2024-01-01 10:00:00")
    // NULL column every 7th row; unicode department on even rows
    assert(vm.filter($"program".isNull && $"id" <= 300).count() === 43)
    assert(vm.filter($"department" === "Café Ünïcode").count() === 150)
  }

  test("overflow chain: the >8KB payload row reads back intact") {
    val vm = Sqlite.readTable(spark, db, "vendor_mappings")
    val big = vm.filter($"gl_account" === "6999").collect()
    assert(big.length === 1)
    val v = big.head.getAs[String]("vendor")
    assert(v === "Overflow Vendor " + "x" * 9000)
  }

  test("record serial types: ints of every width, constants, float, text, blob, null") {
    val tt = Sqlite.readTable(spark, db, "typetest").orderBy("k").collect()
    val r1 = tt(0)
    assert(r1.getAs[Long]("i8") === 100L)
    assert(r1.getAs[Long]("i16") === 30000L)
    assert(r1.getAs[Long]("i24") === 8000000L)
    assert(r1.getAs[Long]("i32") === 2000000000L)
    assert(r1.getAs[Long]("i48") === 140000000000000L)
    assert(r1.getAs[Long]("i64") === Long.MaxValue)
    assert(r1.getAs[Long]("zero") === 0L && r1.getAs[Long]("one") === 1L)
    assert(r1.getAs[Double]("f") === 3.5)
    assert(r1.getAs[String]("t") === "héllo🙂")
    assert(r1.getAs[Array[Byte]]("b").toSeq === Seq(0xDE, 0xAD, 0xBE, 0xEF).map(_.toByte))
    assert(r1.isNullAt(r1.fieldIndex("missing")))
    val r2 = tt(1)
    assert(r2.getAs[Long]("i8") === -100L)
    assert(r2.getAs[Long]("i64") === Long.MinValue)
    assert(r2.getAs[Double]("f") === -2.25)
    assert(r2.getAs[String]("t") === "" && r2.getAs[Array[Byte]]("b").isEmpty)
    assert(r2.getAs[String]("missing") === "seen")
  }

  test("rowid alias: only exact INTEGER PRIMARY KEY (column- or table-level) reads the rowid") {
    // fixture: every table stores ids 10/20/30; a wrong alias decision
    // reads rowids 1/2/3 instead (tools/make_sqlite_fixture2.py)
    val fx = "src/test/resources/fixtures/pk_variants.db"
    def ids(t: String): Seq[Long] =
      Sqlite.readTable(spark, fx, t).select("id").as[Long].collect().toSeq.sorted
    assert(ids("t_exact") === Seq(10L, 20L, 30L))   // alias: NULL in record, rowid=id
    assert(ids("t_int") === Seq(10L, 20L, 30L))     // NOT alias: values from the record
    assert(ids("t_bigint") === Seq(10L, 20L, 30L))  // NOT alias
    assert(ids("t_tablepk") === Seq(10L, 20L, 30L)) // alias via PRIMARY KEY(id)
    // the values column proves rows line up with ids either way
    val v = Sqlite.readTable(spark, fx, "t_int").orderBy("id")
      .select("v").as[String].collect().toSeq
    assert(v === Seq("row10", "row20", "row30"))
  }

  test("rowid alias DESC asymmetry: table-level PRIMARY KEY(id DESC) aliases, column-level DESC does not") {
    // sqlite.org/lang_createtable.html#rowid: DESC disqualifies ONLY the
    // column-level form. Fixture asserts stock SQLite agrees
    // (tools/make_sqlite_fixture3.py): t_tablepk_desc stores NULL in the
    // record (rowid=id); t_colpk_desc stores real values with rowids 1/2/3.
    val fx = "src/test/resources/fixtures/pk_desc.db"
    def ids(t: String): Seq[Long] =
      Sqlite.readTable(spark, fx, t).select("id").as[Long].collect().toSeq.sorted
    assert(ids("t_tablepk_desc") === Seq(10L, 20L, 30L)) // alias despite DESC
    assert(ids("t_colpk_desc") === Seq(10L, 20L, 30L))   // record values, not rowids
    val v = Sqlite.readTable(spark, fx, "t_tablepk_desc").orderBy("id")
      .select("v").as[String].collect().toSeq
    assert(v === Seq("row10", "row20", "row30"))
  }

  test("rollback journal: hot -journal sidecar is refused, cold (empty) journal reads fine") {
    // a hot journal means the main file may hold uncommitted/torn pages —
    // the same stale/dirty failure class the WAL gate refuses
    val hotErr = intercept[IllegalArgumentException] {
      Sqlite.tables("src/test/resources/fixtures/journal_hot.db")
    }
    assert(hotErr.getMessage.contains("hot rollback journal"))
    val cold = Sqlite.readTable(spark,
      "src/test/resources/fixtures/journal_cold.db", "t")
    assert(cold.select("v").as[String].collect().toSeq === Seq("committed"))
  }

  test("WAL mode: pending sidecar frames replay (round 12), checkpointed db reads fine") {
    // wal_pending.db's committed rows (even the CREATE TABLE) live only in
    // the sidecar — round 12 replays the frames instead of refusing, so
    // the read serves exactly what a live sqlite3 connection would see
    val replayed = Sqlite.readTable(spark,
      "src/test/resources/fixtures/wal_pending.db", "pending")
    assert(replayed.select("v").as[String].collect().toSeq === Seq("only-in-wal"))
    // a WAL-mode db with no pending sidecar is fully checkpointed: safe
    val clean = Sqlite.readTable(spark,
      "src/test/resources/fixtures/wal_clean.db", "pending")
    assert(clean.select("v").as[String].collect().toSeq === Seq("only-in-wal"))
  }

  test("WAL replay: multi-commit overlay (insert + update + delete beat the stale main)") {
    // main file holds generation-1 only (checkpointed before three later
    // WAL commits); the replayed view must show the insert, the UPDATE of
    // a checkpointed row (later-frame-wins on an existing page), and the
    // DELETE — the expected rows were captured from the LIVE connection
    // at fixture-build time (tools/make_sqlite_fixture4.py)
    import scala.jdk.CollectionConverters._
    val expected = {
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("src/test/resources/fixtures/wal_expected.json")), "UTF-8")
      // minimal JSON parse: rows are [id, "v"] pairs under "wal_multi"
      val body = txt.split("\"wal_multi\":")(1).split("]\\s*,\\s*\"wal_growth\"")(0)
      "\\[\\s*(\\d+)\\s*,\\s*\"([^\"]+)\"\\s*\\]".r.findAllMatchIn(body)
        .map(m => (m.group(1).toLong, m.group(2))).toSeq
    }
    assert(expected.nonEmpty && expected.exists(_._2 == "gen3-updated"))
    val got = Sqlite.readTable(spark,
      "src/test/resources/fixtures/wal_multi.db", "t")
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(got === expected)
    // and the view is NOT the stale main: updated row present, deleted gone
    assert(got.exists(_ == (5L, "gen3-updated")))
    assert(!got.exists(_._1 == 6L))
    assert(got.exists(_._1 == 100L))
  }

  test("WAL replay: frames can grow the database past the main file's EOF") {
    val g = Sqlite.readTable(spark,
      "src/test/resources/fixtures/wal_growth.db", "g")
    assert(g.count() === 200L)
    assert(g.agg(sum($"id")).head.getLong(0) === (1L to 200L).sum)
  }

  test("S4/S5 end-to-end: sqlite dim drives the exact->fuzzy vendor enrichment") {
    val dim = Sqlite.readTable(spark, db, "vendor_mappings")
      .filter($"gl_account" =!= "6999")
    val facts = Seq(
      (1L, "Vendor 007 Inc"), // exact hit
      (2L, "042"),            // fuzzy: contained in "Vendor 042 Inc"
      (3L, "No Such Vendor zzz")
    ).toDF("txn_id", "vendor_raw")
    val out = graft.operators.Enrichment.twoPhase(
        facts, dim, factId = "txn_id", factKey = "vendor_raw",
        dimId = "id", dimKey = "vendor", payload = Seq("gl_account"))
      .orderBy("txn_id")
      .select("txn_id", "gl_account", "match_type")
      .as[(Long, String, String)].collect().toSeq
    assert(out === Seq(
      (1L, "6710", "exact"),  // 7 % 9 = 7 -> 6710
      (2L, "6610", "fuzzy"),  // 42 % 9 = 6 -> 6610, first match by id
      (3L, null, "none")))
  }
}
