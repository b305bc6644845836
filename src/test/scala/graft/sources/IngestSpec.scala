package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

class IngestSpec extends SparkSpec {
  import spark.implicits._

  def mkDropDir(): String = {
    val dir = Files.createTempDirectory("graft_drop").toString
    Files.createDirectories(Paths.get(s"$dir/2024-01"))
    Files.write(Paths.get(s"$dir/2024-01/stmt_a.pdf"), "01/03 01/03 2466 AMAZON 39.12".getBytes)
    Files.write(Paths.get(s"$dir/2024-01/stmt_b.pdf"), "01/05 01/06 8832 REFUND 15.00".getBytes)
    Files.write(Paths.get(s"$dir/notes.txt"), "not a pdf".getBytes)
    dir
  }

  test("FULL reference pipeline: IMAP fetch -> landing -> binaryFile scan -> transactions") {
    // the round-12 closing loop: an email with an AES-256-ENCRYPTED
    // statement PDF rides the RFC 3501 client into the month-partitioned
    // landing dir, the standard binaryFile scan picks it up, the real
    // extractor decrypts+parses it, and Statement.parse produces the
    // transactions — main.py + email_fetcher.py end-to-end in one test
    def at(x: Int, y: Int, t: String) = s"BT /F1 10 Tf $x $y Td ($t) Tj ET"
    val cs = Seq(
      at(50, 600, "Transaction"), at(122, 600, "Details"),
      at(465, 570, "Credits"), at(540, 570, "Charges"),
      at(40, 555, "Trans"), at(80, 555, "Post"), at(115, 555, "Reference"),
      at(40, 540, "01/03"), at(80, 540, "01/03"), at(120, 540, "2466XY"),
      at(170, 540, "AMAZON"), at(230, 540, "MKTPL"), at(545, 540, "39.12")
    ).mkString("\n")
    val pdf = TestPdfCrypt.encryptPdfV5(TestPdf.mkPdf(Seq(cs), compress = true), r = 6)
    val spec = new ImapSpec
    val server = new spec.TestServer(Map(
      1L -> spec.mimeMessage("Your credit card statement", Seq(("enc_stmt.pdf", pdf)))))
    val landing = Files.createTempDirectory("imap_e2e").toFile
    try {
      val client = Imap.connect("127.0.0.1", server.port, ssl = false)
      client.login("u", "p"); client.select("INBOX")
      val landed = Imap.fetchStatements(client, landing,
        java.time.LocalDate.of(2024, 1, 20))
      client.logout(); client.close()
      assert(landed.map(_.getName) === Seq("enc_stmt.pdf"))
      val words = Ingest.extractWords(Ingest.binaryScan(spark, landing.getAbsolutePath))
      val txns = graft.pipeline.Statement.parse(words).collect()
        .map(r => (r.getAs[String]("date"), r.getAs[String]("vendor"),
          r.getAs[java.math.BigDecimal]("amount").doubleValue())).toSet
      assert(txns === Set(("01/03", "AMAZON MKTPL", 39.12)))
    } finally {
      landing.listFiles().foreach { d =>
        if (d.isDirectory) d.listFiles().foreach(_.delete()); d.delete()
      }
      landing.delete()
    }
  }

  test("binary glob scan is recursive and respects the glob filter") {
    val dir = mkDropDir()
    val files = Ingest.binaryScan(spark, dir)
    val paths = files.select("path").as[String].collect()
    assert(paths.length === 2)
    assert(paths.forall(_.endsWith(".pdf")))
  }

  test("word extraction produces the FIXTURES.md A1 contract") {
    val dir = mkDropDir()
    val words = Ingest.extractWords(Ingest.binaryScan(spark, dir))
    assert(words.columns.toSeq ===
      Seq("file", "page", "text", "x0", "x1", "top", "bottom"))
    val amazon = words.filter($"text" === "AMAZON").collect()
    assert(amazon.length === 1)
    assert(words.count() === 10)
  }

  test("default extractor dispatches real PDFs to the real reader by content magic") {
    val dir = mkDropDir() // two text files named .pdf -> stub path
    val pdfBytes = TestPdf.mkPdf(Seq(
      """BT /F1 12 Tf 72 720 Td (01/09/2024 HARDWARE 12.75) Tj ET
        |""".stripMargin), compress = true)
    Files.write(Paths.get(s"$dir/2024-01/stmt_real.pdf"), pdfBytes)
    val words = Ingest.extractWords(Ingest.binaryScan(spark, dir))
    // real PDF: decoded by the Pdf reader with real geometry (Courier 12pt
    // at Td 72 720 -> x0 = 72, top = 792-(720+12) = 60)
    val real = words.filter($"file".endsWith("stmt_real.pdf"))
      .orderBy("x0").collect()
    assert(real.map(_.getAs[String]("text")).toSeq ===
      Seq("01/09/2024", "HARDWARE", "12.75"))
    assert(real.head.getAs[Double]("x0") === 72.0)
    assert(real.head.getAs[Double]("top") === 60.0)
    // text fixtures named .pdf: still stubbed (5 words each, stub layout)
    assert(words.filter($"file".endsWith("stmt_a.pdf")).count() === 5)
  }

  test("manifest dedup drops already-landed filenames (F13)") {
    val dir = mkDropDir()
    val incoming = Ingest.binaryScan(spark, dir)
    val manifest = Seq("stmt_a.pdf").toDF("filename")
    val fresh = Ingest.dedupAgainstManifest(incoming, manifest)
      .select("filename").as[String].collect()
    assert(fresh.toSeq === Seq("stmt_b.pdf"))
  }

  test("email subject/date filters select statement mail (F11/F12)") {
    val ts = java.sql.Timestamp.valueOf("2024-02-01 12:00:00")
    val mail = Seq(
      ("Your Credit Card Statement", "alerts@wellsfargo.com", "2024-01-20 08:00:00"),
      ("Mastercard statement ready", "alerts@wellsfargo.com", "2023-11-01 08:00:00"), // too old
      ("Credit card offer!!", "spam@other.com", "2024-01-25 08:00:00"),               // wrong sender
      ("Lunch?", "friend@wellsfargo.com", "2024-01-28 08:00:00")                      // wrong subject
    ).toDF("subject", "from", "received_s")
      .withColumn("received", $"received_s".cast("timestamp")).drop("received_s")
    val got = Ingest.statementSubjectFilter(Ingest.recentFromBank(mail, ts))
      .select("subject").as[String].collect().toSeq
    assert(got === Seq("Your Credit Card Statement"))
  }

  test("config JSON loads with explicit schema and normalizes to a code table (S6)") {
    val p = java.nio.file.Files.createTempDirectory("cfg").resolve("config.json")
    java.nio.file.Files.writeString(p,
      """{ "gl_codes": { "51000": "Office Supplies", "52000": "Travel" } }""")
    val codes = Config.glCodes(Config.load(spark, p.toString))
      .orderBy("code").collect()
      .map(r => (r.getAs[String]("code_type"), r.getAs[String]("code"), r.getAs[String]("name")))
    assert(codes.toSeq === Seq(("gl", "51000", "Office Supplies"), ("gl", "52000", "Travel")))
  }

  test("report filename is timestamped (K3)") {
    val name = graft.pipeline.Report.reportFilename(
      java.time.LocalDateTime.of(2024, 2, 1, 13, 45, 9))
    assert(name === "credit_card_transactions_20240201_134509.csv")
  }

  test("streaming binaryFile landing processes new files incrementally") {
    val dir = mkDropDir()
    val stream = Ingest.withMonthPartition(
      Ingest.binaryStream(spark, dir).drop("content"))
    val q = stream.writeStream.format("memory").queryName("landing")
      .outputMode("append").start()
    q.processAllAvailable()
    assert(spark.table("landing").count() === 2)
    Files.write(Paths.get(s"$dir/2024-01/stmt_c.pdf"), "02/01 02/02 1111 NEW 1.00".getBytes)
    q.processAllAvailable()
    q.stop()
    assert(spark.table("landing").count() === 3)
    val months = spark.table("landing").select("month").distinct().as[String].collect()
    assert(months.nonEmpty)
  }
}
