package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator`s (SURVEY.md §2.10: the engine must expose the typed
  * aggregation surface). Registered via `functions.udaf` in specs/sessions. */
object Aggregators {

  /** Bounding box of a word cloud — the typed form of the reference's
    * per-page spatial scalars (pdf_parser.py:137-146). */
  case class Box(minX: Double, maxX: Double, minTop: Double, maxTop: Double, n: Long)

  object BoundingBox extends Aggregator[(Double, Double), Box, Box] {
    def zero: Box = Box(Double.MaxValue, Double.MinValue, Double.MaxValue, Double.MinValue, 0L)
    def reduce(b: Box, w: (Double, Double)): Box =
      Box(math.min(b.minX, w._1), math.max(b.maxX, w._1),
        math.min(b.minTop, w._2), math.max(b.maxTop, w._2), b.n + 1)
    def merge(a: Box, b: Box): Box =
      Box(math.min(a.minX, b.minX), math.max(a.maxX, b.maxX),
        math.min(a.minTop, b.minTop), math.max(a.maxTop, b.maxTop), a.n + b.n)
    def finish(b: Box): Box = b
    def bufferEncoder: Encoder[Box] = Encoders.product[Box]
    def outputEncoder: Encoder[Box] = Encoders.product[Box]
  }

  /** Exact money sum over string amounts using MoneyParse semantics —
    * unparseable values are counted, not silently dropped. */
  case class MoneySum(cents: Long, parsed: Long, failed: Long)

  object MoneySumAgg extends Aggregator[String, MoneySum, MoneySum] {
    def zero: MoneySum = MoneySum(0L, 0L, 0L)
    def reduce(b: MoneySum, s: String): MoneySum = {
      val d = MoneyParse.parse(s)
      if (d == null) b.copy(failed = b.failed + 1)
      else MoneySum(b.cents + (d.toBigDecimal * 100).toLongExact,
        b.parsed + 1, b.failed)
    }
    def merge(a: MoneySum, b: MoneySum): MoneySum =
      MoneySum(a.cents + b.cents, a.parsed + b.parsed, a.failed + b.failed)
    def finish(b: MoneySum): MoneySum = b
    def bufferEncoder: Encoder[MoneySum] = Encoders.product[MoneySum]
    def outputEncoder: Encoder[MoneySum] = Encoders.product[MoneySum]
  }
}
