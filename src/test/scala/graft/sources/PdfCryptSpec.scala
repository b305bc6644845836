package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Pdf.PdfCrypt

/** The standard-security-handler primitives, checked two independent ways:
  * cross-implementation agreement (the engine's decrypt-side PdfCrypt vs
  * the test-side TestPdfCrypt encryptor were written separately from the
  * same public spec — agreeing on key material is evidence both read the
  * spec right, not just that one mirrors the other's bugs) and algebraic
  * properties (RC4 is an involution; AES-CBC round-trips). */
class PdfCryptSpec extends AnyFunSuite {

  private def bytes(s: String) = s.getBytes("ISO-8859-1")

  test("RC4 is a self-inverse keystream cipher") {
    val key = bytes("0123456789abcdef")
    for (len <- Seq(0, 1, 15, 16, 17, 1000)) {
      val data = Array.tabulate(len)(i => ((i * 37 + 11) & 0xff).toByte)
      val enc = PdfCrypt.rc4(key, data)
      assert(PdfCrypt.rc4(key, enc).toSeq === data.toSeq, s"len=$len")
      if (len > 8) assert(enc.toSeq !== data.toSeq)
    }
    // short keys cycle (key schedule uses key(i % len))
    assert(PdfCrypt.rc4(Array[Byte](1), bytes("x")).nonEmpty)
  }

  test("legacy file key + /U agree across the two independent implementations") {
    for (r <- Seq(2, 3); n <- Seq(5, 16)) {
      val o = TestPdfCrypt.computeO(bytes("owner"), Array.empty, r, n)
      val engineKey = PdfCrypt.fileKey(o, -3904, TestPdfCrypt.id0, r, n,
        encryptMetadata = true)
      val testKey = TestPdfCrypt.fileKey(Array.empty, o, -3904, TestPdfCrypt.id0, r, n)
      assert(engineKey.toSeq === testKey.toSeq, s"r=$r n=$n")
      val engineU = PdfCrypt.userCheck(engineKey, TestPdfCrypt.id0, r)
      val testU = TestPdfCrypt.computeU(testKey, TestPdfCrypt.id0, r)
      if (r == 2) assert(engineU.toSeq === testU.toSeq)
      else assert(engineU.take(16).toSeq === testU.take(16).toSeq, s"r=$r n=$n")
    }
  }

  test("Algorithm 2.B agrees across implementations and separates inputs") {
    for (r <- Seq(5, 6); pwd <- Seq("", "hunter2")) {
      val a = PdfCrypt.hash2B(bytes(pwd), bytes("saltSalt"), Array.empty, r)
      val b = TestPdfCrypt.hash2B(bytes(pwd), bytes("saltSalt"), Array.empty, r)
      assert(a.length === 32)
      assert(a.toSeq === b.toSeq, s"r=$r pwd='$pwd'")
    }
    // different salt, different password, different revision → different keys
    val base = PdfCrypt.hash2B(Array.empty, bytes("saltSalt"), Array.empty, 6)
    assert(base.toSeq !== PdfCrypt.hash2B(Array.empty, bytes("saltSalU"), Array.empty, 6).toSeq)
    assert(base.toSeq !== PdfCrypt.hash2B(bytes("x"), bytes("saltSalt"), Array.empty, 6).toSeq)
    assert(base.toSeq !== PdfCrypt.hash2B(Array.empty, bytes("saltSalt"), Array.empty, 5).toSeq)
  }

  test("AES-CBC stream decrypt round-trips the test encryptor, strips PKCS#7") {
    val key16 = PdfCrypt.md5(bytes("k"))
    for (len <- Seq(1, 15, 16, 31, 32, 500)) {
      val data = Array.tabulate(len)(i => ((i * 13 + 7) & 0xff).toByte)
      val iv = PdfCrypt.md5(bytes(s"iv$len")).take(16)
      val padLen = 16 - (len % 16)
      val padded = data ++ Array.fill(padLen)(padLen.toByte)
      val enc = iv ++ PdfCrypt.aesCbcNoPad(decrypt = false, key16, iv, padded)
      assert(PdfCrypt.aesCbcDecrypt(key16, enc).toSeq === data.toSeq, s"len=$len")
    }
    // too-short ciphertext is contained, not an exception
    assert(PdfCrypt.aesCbcDecrypt(key16, Array.fill(16)(0.toByte)).isEmpty)
  }
}
