package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions (SURVEY.md §2.10 / §7.2 step 8): native
  * `Expression`s with whole-stage codegen — the preferred extension point
  * when builtins can't express a scalar cleanly (a Scala UDF would box every
  * row and block codegen; these inline into the generated Java).
  */

/** `money_parse(s)`: parse a money string like `"$1,234.56"` (also `-`/`(..)`
  * negatives) to DECIMAL(12,2); NULL when unparseable — the reference's
  * null-safe `_parse_amount` (pdf_parser.py:385-395) plus accounting
  * parentheses. */
case class MoneyParse(child: Expression)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DecimalType(12, 2)
  override def nullable: Boolean = true
  override def prettyName: String = "money_parse"

  override def nullSafeEval(input: Any): Any =
    MoneyParse.parse(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = MoneyParse.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = (Decimal) $cls.parse($c.toString());
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MoneyParse =
    copy(child = newChild)
}

object MoneyParse {
  /** Shared by interpreted + codegen paths. Returns null for garbage. */
  def parse(raw: String): org.apache.spark.sql.types.Decimal = {
    var s = raw.trim
    var neg = false
    if (s.startsWith("(") && s.endsWith(")")) { neg = true; s = s.substring(1, s.length - 1) }
    s = s.replace("$", "").replace(",", "").trim
    if (s.startsWith("-")) { neg = true; s = s.substring(1) }
    if (s.isEmpty || !s.forall(ch => ch.isDigit || ch == '.')) return null
    try {
      val d = Decimal(BigDecimal(s))
      val out = if (neg) -d else d
      if (out.changePrecision(12, 2)) out else null
    } catch { case _: NumberFormatException => null }
  }
}

/** `version_cmp(a, b)`: compare dotted version strings component-wise as
  * ints (missing components = 0) → -1/0/1. The reference's update check
  * (update_checker.py:89-96). Codegen-enabled via the shared static. */
case class VersionCmp(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = IntegerType
  override def prettyName: String = "version_cmp"

  override def nullSafeEval(l: Any, r: Any): Any =
    VersionCmp.compare(l.toString, r.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = VersionCmp.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, (a, b) => s"$cls.compare($a.toString(), $b.toString())")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VersionCmp =
    copy(left = l, right = r)
}

object VersionCmp {
  def compare(a: String, b: String): Int = {
    def comps(v: String): Array[Long] =
      v.trim.stripPrefix("v").split("\\.").map(c => c.filter(_.isDigit))
        .map(c => if (c.isEmpty) 0L else c.toLong)
    val (ca, cb) = (comps(a), comps(b))
    val n = math.max(ca.length, cb.length)
    var i = 0
    while (i < n) {
      val x = if (i < ca.length) ca(i) else 0L
      val y = if (i < cb.length) cb(i) else 0L
      if (x != y) return if (x > y) 1 else -1
      i += 1
    }
    0
  }
}

object GraftFunctions {
  /** Column-API surface (inputs coerced to string). */
  def money_parse(c: Column): Column =
    Bridge.column(MoneyParse(Bridge.expression(c.cast("string"))))
  def version_cmp(a: Column, b: Column): Column =
    Bridge.column(VersionCmp(
      Bridge.expression(a.cast("string")), Bridge.expression(b.cast("string"))))

  /** SQL surface: register `money_parse` / `version_cmp` for spark.sql. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("money_parse",
      exprs => MoneyParse(exprs.head), "scala_udf")
    registry.createOrReplaceTempFunction("version_cmp",
      exprs => VersionCmp(exprs(0), exprs(1)), "scala_udf")
  }
}
