package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch: keep the k smallest
  * md5-derived hash values seen; estimate |distinct| ≈ (k−1) / R(k) where
  * R(k) is the k-th smallest hash as a fraction of the hash space
  * (Bar-Yossef et al., RANDOM'02). Fixed-size state, associative merge —
  * the mergeable-sketch shape that makes distributed approximate counting
  * one narrow shuffle.
  *
  * Production note: Spark's builtin `approx_count_distinct` (HyperLogLog++)
  * is preferred; KMV is here to exercise the custom-sketch surface with a
  * deterministic, engine-portable hash, and to back sanity checks of the
  * builtin. */
object KmvSketch {

  val HashSpace: Double = (1L << 60).toDouble

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Top 60 bits of md5, straight from the digest bytes — no per-row
    * provider lookup, no hex round-trip (hot path of the reduce). */
  def hash60(s: String): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h >>> 4 // 64 → 60 bits, matching the 15-hex-char convention
  }

  /** Buffer: sorted ascending array of ≤ k distinct smallest hashes. */
  case class Buf(k: Int, mins: Array[Long])

  def estimate(b: Buf): Double =
    if (b.mins.length < b.k) b.mins.length.toDouble // exact below k distinct
    else (b.k - 1) / (b.mins.last.toDouble / HashSpace)

  private def insert(b: Buf, h: Long): Buf = {
    if (b.mins.length == b.k && h >= b.mins.last) return b
    if (java.util.Arrays.binarySearch(b.mins, h) >= 0) return b
    val merged = (b.mins :+ h).sorted
    Buf(b.k, if (merged.length > b.k) merged.take(b.k) else merged)
  }

  case class KmvAgg(k: Int) extends Aggregator[String, Buf, Double] {
    def zero: Buf = Buf(k, Array.empty)
    def reduce(b: Buf, v: String): Buf = if (v == null) b else insert(b, hash60(v))
    def merge(a: Buf, b: Buf): Buf = b.mins.foldLeft(a)(insert)
    def finish(b: Buf): Double = estimate(b)
    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
