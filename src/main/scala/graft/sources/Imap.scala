package graft.sources

/** Dependency-free IMAP4rev1 statement fetcher — closes S7's NETWORK half
  * (`email_fetcher.py:11-105`) the same way `Pdf`/`Sqlite`/`ExcelSink`
  * closed their format surfaces: by speaking the public protocols
  * directly — IMAP4rev1 (RFC 3501: tagged commands, untagged responses,
  * byte-counted literals) and MIME (RFC 2045/2183: multipart boundary
  * walk, base64/quoted-printable transfer decoding, Content-Disposition
  * filenames) — instead of depending on a mail library the container
  * does not have.
  *
  * Faithful to the reference pipeline: SEARCH the last 30 days from the
  * sender (`SINCE "dd-MMM-yyyy" FROM "sender"` — email_fetcher.py:38-44),
  * client-side subject-keyword filter (49-56), MIME walk for `.pdf`
  * attachments (67-85), landing into `downloads/YYYY-MM/` with
  * skip-if-exists dedup (71-90). One deliberate improvement: each message
  * is FETCHed once (the reference fetches RFC822 twice — once for the
  * subject, once for attachments). The clock is injected (the K3
  * convention) so tests and re-runs are deterministic; TLS is a socket-
  * factory choice (`javax.net.ssl` is JDK-standard), so the in-test
  * loopback server and a real `outlook.office365.com:993` differ only in
  * the connect call.
  *
  * The landed files feed the SAME `binaryFile` scan → [[Pdf.wordExtractor]]
  * pipeline the rest of S1/S2 uses (IngestSpec/StreamingSpec) — this
  * module only moves bytes to the landing dir, exactly like the
  * reference. */
object Imap {

  /** RFC 3501 §4.3/§9 quoted-string for a command argument: backslash and
    * double-quote are escaped (the reference's `imaplib._quote` rule —
    * imaplib.py `_quote`), and CR/LF are rejected outright because a bare
    * newline inside any argument would terminate the command line and
    * inject a second protocol command regardless of quoting. Used for
    * LOGIN credentials and SEARCH string criteria so passwords/filters
    * containing `"` or `\` work as they do in the reference. */
  def quoteArg(s: String): String = {
    require(!s.exists(c => c == '\r' || c == '\n'),
      "IMAP command arguments must not contain CR/LF")
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
  }

  /** Connect a client. `ssl = true` wraps the JDK's default SSLSocketFactory
    * (the real-server path — credentials MUST NOT cross a plaintext socket
    * outside loopback tests); a read timeout bounds every protocol wait so
    * a hung server fails the fetch instead of wedging the pipeline. */
  def connect(host: String, port: Int, ssl: Boolean,
              readTimeoutMs: Int = 120000): Client = {
    val socket =
      if (ssl) javax.net.ssl.SSLSocketFactory.getDefault.createSocket(host, port)
      else new java.net.Socket(host, port)
    socket.setSoTimeout(readTimeoutMs)
    new Client(socket)
  }

  /** Minimal IMAP4rev1 client: tagged commands, untagged response
    * collection, `{N}`-literal handling (the FETCH payload syntax). Every
    * command validates its tagged completion is `OK` — a `NO`/`BAD` fails
    * loudly with the server's text. */
  final class Client(socket: java.net.Socket) extends AutoCloseable {
    private val in = new java.io.BufferedInputStream(socket.getInputStream)
    private val out = new java.io.BufferedOutputStream(socket.getOutputStream)
    private var tagN = 0

    /** One CRLF-terminated line, CRLF stripped (ISO-8859-1: IMAP protocol
      * text is 7-bit; message bytes ride literals, not lines). */
    private def readLine(): String = {
      val sb = new java.lang.StringBuilder
      var c = in.read()
      while (c >= 0 && c != '\n') {
        if (c != '\r') sb.append(c.toChar)
        c = in.read()
      }
      require(c >= 0 || sb.length() > 0, "IMAP connection closed mid-response")
      sb.toString
    }

    require(readLine().startsWith("* OK"), "unexpected IMAP greeting")

    /** Send one command; collect untagged lines (with any attached
      * literals) until this command's tagged completion. */
    private def command(cmd: String): Seq[(String, Array[Byte])] = {
      tagN += 1
      val tag = s"a$tagN"
      out.write(s"$tag $cmd\r\n".getBytes("ISO-8859-1"))
      out.flush()
      val resp = Seq.newBuilder[(String, Array[Byte])]
      var done = false
      while (!done) {
        var line = readLine()
        var lit: Array[Byte] = Array.empty
        // a line ending in {N} announces N raw bytes, then the SAME
        // logical line continues (RFC 3501 §4.3) — possibly with another
        // literal, hence the loop
        while (line.matches(".*\\{\\d+\\}$")) {
          val n = line.substring(line.lastIndexOf('{') + 1, line.length - 1).toInt
          val buf = new Array[Byte](n)
          var r = 0
          while (r < n) {
            val k = in.read(buf, r, n - r)
            require(k >= 0, "IMAP connection closed mid-literal")
            r += k
          }
          lit = lit ++ buf
          line = line + readLine()
        }
        if (line.startsWith(tag + " ")) {
          require(line.startsWith(tag + " OK"), s"IMAP command failed: $line")
          done = true
        } else resp += ((line, lit))
      }
      resp.result()
    }

    def login(user: String, password: String): Unit = {
      command(s"LOGIN ${quoteArg(user)} ${quoteArg(password)}"); ()
    }

    def select(mailbox: String): Unit = { command(s"SELECT ${quoteArg(mailbox)}"); () }

    /** Raw criteria SEARCH; returns the matched message sequence numbers. */
    def search(criteria: String): Seq[Long] =
      command(s"SEARCH $criteria").collect {
        case (l, _) if l.toUpperCase.startsWith("* SEARCH") =>
          l.drop("* SEARCH".length).trim.split("\\s+").toSeq
            .filter(_.nonEmpty).map(_.toLong)
      }.flatten

    /** Full RFC822 message bytes of one message. */
    def fetchRfc822(id: Long): Array[Byte] =
      command(s"FETCH $id (RFC822)").collectFirst {
        case (l, lit) if l.toUpperCase.contains("FETCH") && lit.nonEmpty => lit
      }.getOrElse(throw new IllegalStateException(s"no RFC822 literal for message $id"))

    def logout(): Unit = { command("LOGOUT"); () }

    override def close(): Unit = socket.close()
  }

  // ---- MIME (RFC 2045/2183) ---------------------------------------------

  /** A decoded MIME LEAF part: lower-cased/unfolded headers + transfer-
    * decoded body. */
  case class Part(headers: Map[String, String], body: Array[Byte]) {
    /** Content-Disposition filename (quoted or token form). */
    def filename: Option[String] =
      headers.get("content-disposition").flatMap { cd =>
        val q = "filename=\"([^\"]*)\"".r.findFirstMatchIn(cd).map(_.group(1))
        q.orElse("filename=([^;\\s]+)".r.findFirstMatchIn(cd).map(_.group(1)))
      }
    def hasDisposition: Boolean = headers.contains("content-disposition")
  }

  /** Header block parse: names lower-cased, folded continuations (leading
    * whitespace) joined — RFC 5322 §2.2.3. Returns (headers, body offset). */
  private def splitHeaders(raw: Array[Byte], from: Int): (Map[String, String], Int) = {
    val s = new String(raw, "ISO-8859-1")
    var i = from
    val headers = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var last: String = null
    var done = -1
    while (done < 0) {
      val nl = s.indexOf('\n', i)
      val lineEnd = if (nl < 0) s.length else nl
      val line = s.substring(i, lineEnd).stripSuffix("\r")
      if (line.isEmpty) done = (if (nl < 0) s.length else nl + 1)
      else {
        if ((line(0) == ' ' || line(0) == '\t') && last != null)
          headers(last) = headers(last) + " " + line.trim
        else {
          val colon = line.indexOf(':')
          if (colon > 0) {
            last = line.substring(0, colon).trim.toLowerCase
            headers(last) = line.substring(colon + 1).trim
          }
        }
        i = lineEnd + 1
        if (nl < 0) done = s.length
      }
    }
    (headers.toMap, done)
  }

  /** Top-level message headers (Subject/From live here, not in parts). */
  def topHeaders(raw: Array[Byte]): Map[String, String] = splitHeaders(raw, 0)._1

  private def qpDecode(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(b.length)
    var i = 0
    while (i < b.length) {
      val c = b(i)
      if (c == '=' && i + 2 < b.length && b(i + 1) == '\r' && b(i + 2) == '\n') i += 3 // soft break
      else if (c == '=' && i + 1 < b.length && b(i + 1) == '\n') i += 2
      else if (c == '=' && i + 2 < b.length) {
        out.write(Integer.parseInt(new String(b, i + 1, 2, "ISO-8859-1"), 16)); i += 3
      } else { out.write(c.toInt); i += 1 }
    }
    out.toByteArray
  }

  /** All decoded LEAF parts of a message — the `email.walk()` analog:
    * multipart containers recurse (boundary from the Content-Type
    * parameter, quoted or token), leaves transfer-decode per
    * Content-Transfer-Encoding (base64 / quoted-printable / identity). */
  def mimeParts(raw: Array[Byte]): Seq[Part] = {
    val (headers, bodyAt) = splitHeaders(raw, 0)
    val ct = headers.getOrElse("content-type", "text/plain").toLowerCase
    if (ct.startsWith("multipart/")) {
      val ctRaw = headers("content-type")
      val boundary = "boundary=\"([^\"]*)\"".r.findFirstMatchIn(ctRaw).map(_.group(1))
        .orElse("(?i)boundary=([^;\\s]+)".r.findFirstMatchIn(ctRaw).map(_.group(1)))
        .getOrElse(throw new IllegalArgumentException(s"multipart without boundary: $ctRaw"))
      val s = new String(raw, "ISO-8859-1")
      val sep = s"--$boundary"
      // boundary markers must start a line (RFC 2046 §5.1.1); a part spans
      // from the end of one marker line to the start of the next marker,
      // minus the CRLF that belongs to that next marker line
      def sepAt(i: Int): Boolean = i == 0 || s(i - 1) == '\n'
      val marks = Iterator.iterate(s.indexOf(sep, bodyAt))(p => s.indexOf(sep, p + 1))
        .takeWhile(_ >= 0).filter(sepAt).toSeq
      marks.sliding(2).flatMap {
        case Seq(a, b) if !s.startsWith("--", a + sep.length) =>
          val contentStart = s.indexOf('\n', a) + 1
          val end = if (b >= 2 && s(b - 2) == '\r' && s(b - 1) == '\n') b - 2
                    else if (b >= 1 && s(b - 1) == '\n') b - 1 else b
          if (contentStart > 0 && contentStart <= end)
            mimeParts(java.util.Arrays.copyOfRange(raw, contentStart, end))
          else Seq.empty
        case _ => Seq.empty
      }.toSeq
    } else {
      val body = java.util.Arrays.copyOfRange(raw, bodyAt, raw.length)
      val cte = headers.getOrElse("content-transfer-encoding", "7bit").toLowerCase
      val decoded = cte match {
        case "base64" =>
          java.util.Base64.getMimeDecoder.decode(new String(body, "ISO-8859-1").trim)
        case "quoted-printable" => qpDecode(body)
        case _ => body
      }
      Seq(Part(headers, decoded))
    }
  }

  // ---- the reference pipeline --------------------------------------------

  private val imapDate =
    java.time.format.DateTimeFormatter.ofPattern("dd-MMM-yyyy", java.util.Locale.US)
  private val monthFmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM")

  /** Search + subject-filter + land `.pdf` attachments into
    * `baseDir/YYYY-MM/` with skip-if-exists dedup — `email_fetcher.py`'s
    * exact dataflow over an injected clock. Returns newly landed files.
    * Filenames are basename-sanitized (a hostile `../x.pdf` attachment
    * name cannot escape the landing dir — the reference inherits this
    * risk from pathlib `/`). */
  def fetchStatements(client: Client, baseDir: java.io.File,
                      today: java.time.LocalDate,
                      senderFilter: String = "wellsfargo.com",
                      subjectKeywords: Seq[String] =
                        Seq("statement", "credit card", "mastercard")): Seq[java.io.File] = {
    val since = today.minusDays(30).format(imapDate)
    val ids = client.search(s"""(SINCE "$since" FROM ${quoteArg(senderFilter)})""")
    val monthDir = new java.io.File(baseDir, today.format(monthFmt))
    monthDir.mkdirs()
    val landed = Seq.newBuilder[java.io.File]
    ids.foreach { id =>
      val raw = client.fetchRfc822(id)
      val subject = topHeaders(raw).getOrElse("subject", "").toLowerCase
      if (subjectKeywords.exists(subject.contains)) {
        mimeParts(raw).filter(_.hasDisposition).foreach { p =>
          p.filename.filter(_.toLowerCase.endsWith(".pdf")).foreach { fn =>
            val f = new java.io.File(monthDir, new java.io.File(fn).getName)
            if (!f.exists()) {
              java.nio.file.Files.write(f.toPath, p.body)
              landed += f
            }
          }
        }
      }
    }
    landed.result()
  }
}
