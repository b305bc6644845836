package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The IMAP fetcher against an IN-TEST RFC 3501 server on a loopback
  * socket: a canned mailbox of real MIME messages (base64 PDF attachments
  * built by TestPdf), a server that speaks greeting/LOGIN/SELECT/SEARCH/
  * FETCH-with-literal/LOGOUT, and assertions on BOTH sides of the wire —
  * the bytes landed AND the SEARCH criteria the client actually sent. */
class ImapSpec extends AnyFunSuite {

  def mimeMessage(subject: String, atts: Seq[(String, Array[Byte])],
                  from: String = "statements@wellsfargo.com"): Array[Byte] = {
    val sb = new StringBuilder
    sb.append(s"From: $from\r\n")
    sb.append(s"Subject: $subject\r\n")
    sb.append("MIME-Version: 1.0\r\n")
    sb.append("Content-Type: multipart/mixed; boundary=\"BNDRY42\"\r\n\r\n")
    sb.append("preamble ignored per RFC 2046\r\n")
    sb.append("--BNDRY42\r\n")
    sb.append("Content-Type: text/plain\r\n\r\n")
    sb.append("Your statement is attached.\r\n")
    atts.foreach { case (name, bytes) =>
      val b64 = java.util.Base64.getMimeEncoder(76, "\r\n".getBytes("ISO-8859-1"))
        .encodeToString(bytes)
      sb.append("--BNDRY42\r\n")
      sb.append(s"""Content-Type: application/pdf; name="$name"""").append("\r\n")
      sb.append(s"""Content-Disposition: attachment; filename="$name"""").append("\r\n")
      sb.append("Content-Transfer-Encoding: base64\r\n\r\n")
      sb.append(b64).append("\r\n")
    }
    sb.append("--BNDRY42--\r\n")
    sb.toString.getBytes("ISO-8859-1")
  }

  /** Single-connection canned IMAP server; records SEARCH criteria. */
  class TestServer(messages: Map[Long, Array[Byte]]) {
    val searches = new java.util.concurrent.CopyOnWriteArrayList[String]()
    private val ss = new java.net.ServerSocket(0, 1,
      java.net.InetAddress.getLoopbackAddress)
    def port: Int = ss.getLocalPort
    private val thread = new Thread(() => {
      try {
        val sock = ss.accept()
        val in = new java.io.BufferedReader(
          new java.io.InputStreamReader(sock.getInputStream, "ISO-8859-1"))
        val out = new java.io.BufferedOutputStream(sock.getOutputStream)
        def w(s: String): Unit = { out.write((s + "\r\n").getBytes("ISO-8859-1")) }
        w("* OK test IMAP4rev1 server ready"); out.flush()
        var open = true
        while (open) {
          val line = in.readLine()
          if (line == null) open = false
          else {
            val sp = line.split(" ", 3)
            val tag = sp(0)
            val cmd = if (sp.length > 1) sp(1).toUpperCase else ""
            val rest = if (sp.length > 2) sp(2) else ""
            cmd match {
              case "LOGIN" => w(s"$tag OK LOGIN completed")
              case "SELECT" =>
                w(s"* ${messages.size} EXISTS"); w(s"$tag OK [READ-WRITE] SELECT completed")
              case "SEARCH" =>
                searches.add(rest)
                w("* SEARCH " + messages.keys.toSeq.sorted.mkString(" "))
                w(s"$tag OK SEARCH completed")
              case "FETCH" =>
                val id = rest.split(" ")(0).toLong
                val msg = messages(id)
                w(s"* $id FETCH (RFC822 {${msg.length}}")
                out.write(msg)
                w(")")
                w(s"$tag OK FETCH completed")
              case "LOGOUT" =>
                w("* BYE test server signing off"); w(s"$tag OK LOGOUT completed")
                open = false
              case _ => w(s"$tag BAD unknown command")
            }
            out.flush()
          }
        }
        sock.close()
      } catch { case _: Exception => () }
      finally ss.close()
    })
    thread.setDaemon(true)
    thread.start()
  }

  val statementPdf: Array[Byte] = TestPdf.mkPdf(Seq(
    """BT /F1 12 Tf 72 700 Td (01/05/2024 COFFEE 4.50) Tj ET
      |""".stripMargin), compress = true)

  test("e2e: search, subject filter, MIME walk, month landing, dedup — and the wire format") {
    val messages = Map(
      1L -> mimeMessage("Your Credit Card Statement is ready",
        Seq(("stmt_jan.pdf", statementPdf))),
      2L -> mimeMessage("Lunch plans?", Seq(("notes.pdf", statementPdf))),
      3L -> mimeMessage("Mastercard statement",
        Seq(("stmt_feb.pdf", statementPdf), ("terms.txt", "fine print".getBytes))))
    val server = new TestServer(messages)
    val dir = java.nio.file.Files.createTempDirectory("imapspec").toFile
    val today = java.time.LocalDate.of(2026, 8, 15)
    try {
      val client = Imap.connect("127.0.0.1", server.port, ssl = false)
      client.login("user@example.com", "pw")
      client.select("INBOX")
      val landed = Imap.fetchStatements(client, dir, today)
      client.logout(); client.close()
      // the SEARCH criteria on the wire: last-30-days + sender, the
      // reference's exact format (email_fetcher.py:38-44)
      assert(server.searches.size === 1)
      assert(server.searches.get(0) ===
        """(SINCE "16-Jul-2026" FROM "wellsfargo.com")""")
      // subject filter drops msg 2; msg 3's non-pdf part is skipped
      assert(landed.map(_.getName).sorted === Seq("stmt_feb.pdf", "stmt_jan.pdf"))
      // month partitioning from the injected clock
      assert(landed.forall(_.getParentFile.getName === "2026-08"))
      // byte-exact landing: the decoded attachment IS the built PDF, and
      // the standard extraction pipeline reads it
      val bytes = java.nio.file.Files.readAllBytes(landed.head.toPath)
      assert(bytes.toSeq === statementPdf.toSeq)
      assert(Pdf.extractWords(bytes).map(_.text).contains("COFFEE"))
    } finally {
      dir.listFiles().foreach { d =>
        if (d.isDirectory) d.listFiles().foreach(_.delete()); d.delete()
      }
      dir.delete()
    }
  }

  test("quoteArg escapes per RFC 3501 and rejects CRLF injection") {
    // plain strings round-trip as simple quoted strings
    assert(Imap.quoteArg("wellsfargo.com") === "\"wellsfargo.com\"")
    // backslash and double-quote escape (imaplib._quote's rule) — a
    // password like p"w\d must reach the server intact, not split the
    // quoted string
    assert(Imap.quoteArg("""p"w\d""") === "\"p\\\"w\\\\d\"")
    // CR/LF anywhere would terminate the command line and inject a
    // second protocol command regardless of quoting — rejected outright
    intercept[IllegalArgumentException](Imap.quoteArg("a\r\nb LOGOUT"))
    intercept[IllegalArgumentException](Imap.quoteArg("a\nb"))
  }

  test("skip-if-exists dedup: a second fetch lands nothing new") {
    val messages = Map(1L -> mimeMessage("statement", Seq(("s.pdf", statementPdf))))
    val dir = java.nio.file.Files.createTempDirectory("imapspec2").toFile
    val today = java.time.LocalDate.of(2026, 8, 15)
    try {
      for (expect <- Seq(1, 0)) {
        val server = new TestServer(messages)
        val client = Imap.connect("127.0.0.1", server.port, ssl = false)
        client.login("u", "p"); client.select("INBOX")
        val landed = Imap.fetchStatements(client, dir, today)
        client.logout(); client.close()
        assert(landed.size === expect)
      }
    } finally {
      dir.listFiles().foreach { d =>
        if (d.isDirectory) d.listFiles().foreach(_.delete()); d.delete()
      }
      dir.delete()
    }
  }

  test("a hostile ../ attachment filename cannot escape the landing dir") {
    val messages = Map(1L -> mimeMessage("statement",
      Seq(("../../evil.pdf", statementPdf))))
    val dir = java.nio.file.Files.createTempDirectory("imapspec3").toFile
    try {
      val server = new TestServer(messages)
      val client = Imap.connect("127.0.0.1", server.port, ssl = false)
      client.login("u", "p"); client.select("INBOX")
      val landed = Imap.fetchStatements(client, dir,
        java.time.LocalDate.of(2026, 8, 15))
      client.logout(); client.close()
      assert(landed.size === 1)
      assert(landed.head.getName === "evil.pdf")
      assert(landed.head.getParentFile.getParentFile.getCanonicalPath ===
        dir.getCanonicalPath)
    } finally {
      dir.listFiles().foreach { d =>
        if (d.isDirectory) d.listFiles().foreach(_.delete()); d.delete()
      }
      dir.delete()
    }
  }

  test("MIME: nested multipart recursion and quoted-printable decoding") {
    val inner =
      "Content-Type: multipart/alternative; boundary=IN\r\n\r\n" +
      "--IN\r\n" +
      "Content-Type: text/plain\r\n" +
      "Content-Transfer-Encoding: quoted-printable\r\n\r\n" +
      "caf=C3=A9 =\r\nline\r\n" +
      "--IN\r\n" +
      "Content-Type: text/html\r\n\r\n" +
      "<b>hi</b>\r\n" +
      "--IN--\r\n"
    val raw = ("Subject: x\r\n" +
      "Content-Type: multipart/mixed; boundary=OUT\r\n\r\n" +
      "--OUT\r\n" + inner +
      "--OUT\r\n" +
      "Content-Type: text/plain\r\n\r\n" +
      "tail\r\n" +
      "--OUT--\r\n").getBytes("ISO-8859-1")
    val parts = Imap.mimeParts(raw)
    assert(parts.length === 3)
    // QP: soft break joins, =C3=A9 decodes to the UTF-8 bytes of é
    assert(new String(parts(0).body, "UTF-8") === "café line")
    assert(new String(parts(1).body, "ISO-8859-1").trim === "<b>hi</b>")
    assert(new String(parts(2).body, "ISO-8859-1").trim === "tail")
  }
}
