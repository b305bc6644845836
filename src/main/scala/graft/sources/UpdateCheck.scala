package graft.sources

/** Dependency-free HTTP update check — closes S9 (`update_checker.py`),
  * the last reference surface, the same way [[Imap]] closed S7: by
  * speaking the public protocol directly (HTTP/1.1 GET over a socket, TLS
  * via the JDK's SSLSocketFactory) instead of an HTTP library. App-level
  * by nature (it prints a banner, touches no data), but "a user of the
  * reference could switch" includes the update banner they see at launch.
  *
  * Faithful semantics (`update_checker.py:9-96`): GitHub releases/latest
  * with the v3 Accept header; `tag_name` with a leading `v` stripped plus
  * `html_url` from the JSON; daily throttle via a `last_check.txt`
  * stamp; silent-None on any network/parse failure (the reference
  * swallows everything — an update check must never break the pipeline);
  * version comparison = integer-wise lexicographic on '.'-split parts,
  * false when either side fails to parse. Clock injected (K3 convention).
  * Mirrors the §2.8 `version_compare` driver query's SQL rule exactly. */
object UpdateCheck {

  /** RFC 7230 §4.1 chunked decoding: each chunk is `size-hex[;ext]CRLF
    * data CRLF`, terminated by a zero-size chunk (trailers ignored). A
    * malformed framing returns None — the silent-fail contract. */
  private[sources] def dechunk(body: String): Option[String] = {
    val sb = new java.lang.StringBuilder
    var i = 0
    var done = false
    while (!done) {
      val nl = body.indexOf("\r\n", i)
      if (nl < 0) return None
      val sizeHex = body.substring(i, nl).split(";")(0).trim
      val size = try Integer.parseInt(sizeHex, 16)
                 catch { case _: NumberFormatException => return None }
      if (size == 0) done = true
      else {
        val start = nl + 2
        if (start + size > body.length) return None
        sb.append(body, start, start + size)
        i = start + size + 2 // skip the chunk-data CRLF
      }
    }
    Some(sb.toString)
  }

  /** Minimal HTTP/1.1 GET: returns the response body when the status is
    * 200, None otherwise. Handles Content-Length bodies,
    * Transfer-Encoding: chunked (the api.github.com default), and
    * connection-close streaming; follows no redirects (the GitHub API
    * answers directly). */
  def httpGet(host: String, port: Int, path: String, ssl: Boolean,
              headers: Map[String, String] = Map.empty): Option[String] =
    try {
      val socket =
        if (ssl) javax.net.ssl.SSLSocketFactory.getDefault.createSocket(host, port)
        else new java.net.Socket(host, port)
      try {
        socket.setSoTimeout(5000) // the reference's 5 s timeout
        val out = new java.io.BufferedOutputStream(socket.getOutputStream)
        val hdrs = Map("Host" -> host, "User-Agent" -> "graft-update-check",
          "Connection" -> "close") ++ headers
        out.write((s"GET $path HTTP/1.1\r\n" +
          hdrs.map { case (k, v) => s"$k: $v\r\n" }.mkString + "\r\n")
          .getBytes("ISO-8859-1"))
        out.flush()
        val in = new java.io.BufferedInputStream(socket.getInputStream)
        val raw = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { raw.write(buf, 0, n); n = in.read(buf) }
        val s = new String(raw.toByteArray, "ISO-8859-1")
        val headerEnd = s.indexOf("\r\n\r\n")
        if (headerEnd < 0) None
        else {
          val statusLine = s.substring(0, s.indexOf("\r\n"))
          if (!statusLine.matches("HTTP/1\\.[01] 200 .*")) None
          else {
            val head = s.substring(0, headerEnd).toLowerCase
            val body0 = s.substring(headerEnd + 4)
            if (head.contains("transfer-encoding:") &&
                "transfer-encoding:\\s*chunked".r.findFirstIn(head).isDefined)
              dechunk(body0)
            else
              Some("content-length:\\s*(\\d+)".r.findFirstMatchIn(head)
                .map(m => body0.take(m.group(1).toInt)).getOrElse(body0))
          }
        }
      } finally socket.close()
    } catch { case _: Exception => None } // silent, like the reference

  /** `tag_name` (leading `v` stripped) and `html_url` from the releases
    * JSON — the two fields the reference reads. A missing field yields
    * None (silent-fail contract). */
  def parseRelease(json: String): Option[(String, String)] = {
    def field(name: String): Option[String] =
      ("\"" + name + "\"\\s*:\\s*\"([^\"]*)\"").r
        .findFirstMatchIn(json).map(_.group(1))
    for (tag <- field("tag_name"))
      yield (tag.stripPrefix("v"), field("html_url").getOrElse(""))
  }

  /** `update_checker.py:89-96` verbatim: integer parts, lexicographic;
    * any unparsable part ⇒ false. The SQL twin is the `version_compare`
    * driver query (§2.8 array higher-order functions). */
  def versionIsNewer(latest: String, current: String): Boolean =
    try {
      val a = latest.split("\\.").map(_.trim.toInt).toSeq
      val b = current.split("\\.").map(_.trim.toInt).toSeq
      import scala.math.Ordering.Implicits._
      a > b
    } catch { case _: NumberFormatException => false }

  /** Daily throttle over an injected clock: returns true (and stamps the
    * file) when no check has happened today — `_should_check` +
    * `_record_check`. An unparsable stamp means check (reference rule). */
  def shouldCheckToday(checkFile: java.io.File,
                       today: java.time.LocalDate): Boolean = {
    val due =
      if (!checkFile.exists()) true
      else {
        val stamp = new String(
          java.nio.file.Files.readAllBytes(checkFile.toPath), "UTF-8").trim
        try {
          val last = java.time.LocalDate.parse(stamp)
          java.time.temporal.ChronoUnit.DAYS.between(last, today) >= 1
        } catch { case _: java.time.format.DateTimeParseException => true }
      }
    if (due)
      java.nio.file.Files.write(checkFile.toPath,
        today.toString.getBytes("UTF-8"))
    due
  }

  /** The full check: throttle → GET releases/latest → compare. Returns
    * Some((latestVersion, downloadUrl)) only when an update exists. */
  def checkForUpdate(host: String, port: Int, repo: String, ssl: Boolean,
                     currentVersion: String, checkFile: java.io.File,
                     today: java.time.LocalDate): Option[(String, String)] =
    if (!shouldCheckToday(checkFile, today)) None
    else for {
      body <- httpGet(host, port, s"/repos/$repo/releases/latest", ssl,
        Map("Accept" -> "application/vnd.github.v3+json"))
      (latest, url) <- parseRelease(body)
      if versionIsNewer(latest, currentVersion)
    } yield (latest, url)
}
