package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** S9 update check against an in-test HTTP server on loopback. */
class UpdateCheckSpec extends AnyFunSuite {

  /** One-shot canned HTTP server; records the request line + headers. */
  class TestHttp(status: String, body: String, connections: Int = 1) {
    val requests = new java.util.concurrent.CopyOnWriteArrayList[String]()
    private val ss = new java.net.ServerSocket(0, 2,
      java.net.InetAddress.getLoopbackAddress)
    def port: Int = ss.getLocalPort
    private val t = new Thread(() => {
      try {
        for (_ <- 1 to connections) {
          val sock = ss.accept()
          val in = new java.io.BufferedReader(
            new java.io.InputStreamReader(sock.getInputStream, "ISO-8859-1"))
          val req = new StringBuilder
          var line = in.readLine()
          while (line != null && line.nonEmpty) { req.append(line).append('\n'); line = in.readLine() }
          requests.add(req.toString)
          val bytes = body.getBytes("UTF-8")
          sock.getOutputStream.write(
            (s"HTTP/1.1 $status\r\nContent-Type: application/json\r\n" +
              s"Content-Length: ${bytes.length}\r\nConnection: close\r\n\r\n")
              .getBytes("ISO-8859-1"))
          sock.getOutputStream.write(bytes)
          sock.getOutputStream.flush()
          sock.close()
        }
      } catch { case _: Exception => () }
      finally ss.close()
    })
    t.setDaemon(true); t.start()
  }

  val releaseJson =
    """{"url": "https://api.example/x", "tag_name": "v2.1.0",
      |"html_url": "https://github.com/acme/etl/releases/tag/v2.1.0",
      |"name": "v2.1.0", "draft": false}""".stripMargin

  test("e2e: GET, Accept header, tag parse, version compare, daily throttle") {
    val server = new TestHttp("200 OK", releaseJson, connections = 2)
    val dir = java.nio.file.Files.createTempDirectory("updchk").toFile
    val checkFile = new java.io.File(dir, "last_check.txt")
    try {
      val today = java.time.LocalDate.of(2026, 8, 15)
      val r = UpdateCheck.checkForUpdate("127.0.0.1", server.port, "acme/etl",
        ssl = false, currentVersion = "1.3.0", checkFile, today)
      assert(r === Some(("2.1.0",
        "https://github.com/acme/etl/releases/tag/v2.1.0")))
      // wire format: path + the GitHub v3 Accept header
      val req = server.requests.get(0)
      assert(req.startsWith("GET /repos/acme/etl/releases/latest HTTP/1.1"))
      assert(req.contains("Accept: application/vnd.github.v3+json"))
      // throttle: the stamp was written; a SAME-DAY recheck never hits
      // the network (the server would accept a second connection)
      assert(new String(java.nio.file.Files.readAllBytes(checkFile.toPath)).trim
        === "2026-08-15")
      assert(UpdateCheck.checkForUpdate("127.0.0.1", server.port, "acme/etl",
        ssl = false, "1.3.0", checkFile, today) === None)
      assert(server.requests.size === 1)
      // next day: due again
      assert(UpdateCheck.shouldCheckToday(checkFile, today.plusDays(1)))
    } finally { dir.listFiles().foreach(_.delete()); dir.delete() }
  }

  test("silent-fail contract: refused connection, non-200, and garbage JSON all yield None") {
    // a port with no listener: connection refused -> None, no exception
    val dead = { val s = new java.net.ServerSocket(0); val p = s.getLocalPort; s.close(); p }
    assert(UpdateCheck.httpGet("127.0.0.1", dead, "/x", ssl = false) === None)
    val s404 = new TestHttp("404 Not Found", "{}")
    assert(UpdateCheck.httpGet("127.0.0.1", s404.port, "/x", ssl = false) === None)
    assert(UpdateCheck.parseRelease("""{"no_tag": true}""") === None)
  }

  test("Transfer-Encoding: chunked responses are de-chunked (the api.github.com default)") {
    // a canned server that chunks the release JSON into uneven pieces
    val ss = new java.net.ServerSocket(0, 2,
      java.net.InetAddress.getLoopbackAddress)
    val t = new Thread(() => {
      try {
        val sock = ss.accept()
        val in = new java.io.BufferedReader(
          new java.io.InputStreamReader(sock.getInputStream, "ISO-8859-1"))
        var line = in.readLine()
        while (line != null && line.nonEmpty) line = in.readLine()
        val out = sock.getOutputStream
        out.write(("HTTP/1.1 200 OK\r\nContent-Type: application/json\r\n" +
          "Transfer-Encoding: chunked\r\nConnection: close\r\n\r\n")
          .getBytes("ISO-8859-1"))
        val bytes = releaseJson.getBytes("UTF-8")
        // three uneven chunks with a chunk extension on the second, then
        // the zero terminator — the full RFC 7230 §4.1 framing grammar
        val cuts = Seq((0, 7), (7, 40), (40, bytes.length))
        cuts.zipWithIndex.foreach { case ((a, b), i) =>
          val ext = if (i == 1) ";x=y" else ""
          out.write(((b - a).toHexString + ext + "\r\n").getBytes("ISO-8859-1"))
          out.write(bytes, a, b - a)
          out.write("\r\n".getBytes("ISO-8859-1"))
        }
        out.write("0\r\n\r\n".getBytes("ISO-8859-1"))
        out.flush(); sock.close()
      } catch { case _: Exception => () } finally ss.close()
    })
    t.setDaemon(true); t.start()
    val body = UpdateCheck.httpGet("127.0.0.1", ss.getLocalPort, "/x", ssl = false)
    assert(body === Some(releaseJson))
    assert(UpdateCheck.parseRelease(body.get).map(_._1) === Some("2.1.0"))
    // malformed framing falls back to None (silent-fail contract)
    assert(UpdateCheck.dechunk("zz\r\nbody") === None)
    assert(UpdateCheck.dechunk("ff\r\nshort") === None)
  }

  test("version comparison matches the reference rule (and the version_compare query)") {
    assert(UpdateCheck.versionIsNewer("2.0.0", "1.9.9"))
    assert(UpdateCheck.versionIsNewer("1.10.0", "1.9.0")) // numeric, not lexical
    assert(UpdateCheck.versionIsNewer("1.3.0.1", "1.3.0")) // longer wins on prefix tie
    assert(!UpdateCheck.versionIsNewer("1.3.0", "1.3.0"))
    assert(!UpdateCheck.versionIsNewer("1.2.9", "1.3.0"))
    assert(!UpdateCheck.versionIsNewer("2.0.0-beta", "1.0.0")) // unparsable -> false
  }
}
