package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Product-quantization primitives (Jégou, Douze & Schmid, "Product
  * Quantization for Nearest Neighbor Search", IEEE TPAMI 2011) as native
  * codegen expressions — the §2.10 extension point, same rationale as
  * [[DotFold]]: the encode/scan loops are the hot path of the PQ tier and
  * a higher-order-function formulation would run interpreted.
  *
  * The codebook rides the expression as a driver-side flattened double
  * array (≤ ksub·d = 16 K doubles = 128 KB — the bounded-literal shape of
  * the s3 fitted centroids) and reaches generated code via
  * `ctx.addReferenceObj`, so no per-row materialization ever happens.
  *
  * Arithmetic contract (what the DuckDB oracle replays verbatim):
  *  - sub-dot(x, j, c) = Σ_{i<dsub} (double)x[j·dsub+i] · cb[c][j·dsub+i],
  *    ascending i, accumulator starting at 0.0 (exact vs a first-element
  *    fold init: 0.0 + x ≡ x);
  *  - encode picks, per subspace j, the 1-BASED codebook row maximizing
  *    sub-dot − hcc with hcc = ½·Σ c², ties to the LOWER row — euclidean
  *    argmin expressed dot-side, the s3 `score = dot − ½‖c‖²` identity;
  *  - ADC sums the per-subspace LUT entries in ascending-j order. */
private[graft] object PqOps {

  /** hcc[j·ksub + c] = ½·Σ_{i<dsub} cb[c][j·dsub+i]² — ascending i, 0.0
    * init, one multiply by 0.5 at the end: the fold DuckDB's
    * `0.5 * list_reduce(x²)` performs. */
  def halfNorms(cbFlat: Array[Double], m: Int, dsub: Int): Array[Double] = {
    val d = m * dsub
    val ksub = cbFlat.length / d
    val out = new Array[Double](m * ksub)
    var c = 0
    while (c < ksub) {
      var j = 0
      while (j < m) {
        var acc = 0.0
        var i = 0
        while (i < dsub) { val v = cbFlat(c * d + j * dsub + i); acc += v * v; i += 1 }
        out(j * ksub + c) = 0.5 * acc
        j += 1
      }
      c += 1
    }
    out
  }

  def encode(e: ArrayData, isFloat: Boolean, cbFlat: Array[Double],
             hcc: Array[Double], m: Int, dsub: Int): ArrayData = {
    val d = m * dsub
    val ksub = cbFlat.length / d
    if (e.numElements() < d) return null
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = Double.NegativeInfinity
      var bestC = 1
      var c = 0
      while (c < ksub) {
        var acc = 0.0
        var i = 0
        while (i < dsub) {
          val idx = j * dsub + i
          val x = if (isFloat) e.getFloat(idx).toDouble else e.getDouble(idx)
          acc += x * cbFlat(c * d + idx)
          i += 1
        }
        val s = acc - hcc(j * ksub + c)
        if (s > best) { best = s; bestC = c + 1 } // strict > keeps the lower row on ties
        c += 1
      }
      out(j) = bestC
      j += 1
    }
    new GenericArrayData(out)
  }

  /** [[encode]] of the residual vec − anchor: x = (double)vec[i] −
    * (double)anchor[i] inline, same fold/tie contract. The oracle's twin is
    * `list_transform(range, i -> CAST(e[i] AS DOUBLE) − CAST(a[i] AS
    * DOUBLE))` fed through the s8 enc CTE — per-element double
    * subtraction then the identical ascending sub-dot fold. */
  def encodeRes(e: ArrayData, eFloat: Boolean, a: ArrayData, aFloat: Boolean,
                cbFlat: Array[Double], hcc: Array[Double], m: Int,
                dsub: Int): ArrayData = {
    val d = m * dsub
    val ksub = cbFlat.length / d
    if (e.numElements() < d || a.numElements() < d) return null
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = Double.NegativeInfinity
      var bestC = 1
      var c = 0
      while (c < ksub) {
        var acc = 0.0
        var i = 0
        while (i < dsub) {
          val idx = j * dsub + i
          val xv = if (eFloat) e.getFloat(idx).toDouble else e.getDouble(idx)
          val av = if (aFloat) a.getFloat(idx).toDouble else a.getDouble(idx)
          acc += (xv - av) * cbFlat(c * d + idx)
          i += 1
        }
        val s = acc - hcc(j * ksub + c)
        if (s > best) { best = s; bestC = c + 1 } // strict > keeps the lower row on ties
        c += 1
      }
      out(j) = bestC
      j += 1
    }
    new GenericArrayData(out)
  }

  /** lut[j·ksub + (c−1)] = sub-dot(q, j, c) — the per-query ADC lookup
    * table, m·ksub doubles (16 KB at m=8, ksub=256), j-major so the scan
    * indexes it as j·ksub + code−1. */
  def lut(e: ArrayData, isFloat: Boolean, cbFlat: Array[Double],
          m: Int, dsub: Int): ArrayData = {
    val d = m * dsub
    val ksub = cbFlat.length / d
    if (e.numElements() < d) return null
    val out = new Array[Double](m * ksub)
    var c = 0
    while (c < ksub) {
      var j = 0
      while (j < m) {
        var acc = 0.0
        var i = 0
        while (i < dsub) {
          val idx = j * dsub + i
          val x = if (isFloat) e.getFloat(idx).toDouble else e.getDouble(idx)
          acc += x * cbFlat(c * d + idx)
          i += 1
        }
        out(j * ksub + c) = acc
        j += 1
      }
      c += 1
    }
    new GenericArrayData(out)
  }

  /** adot = Σ_j lut[j·ksub + codes[j]−1], ascending j, 0.0 init. */
  def adc(lutArr: ArrayData, codes: ArrayData, ksub: Int): java.lang.Double = {
    val m = codes.numElements()
    if (lutArr.numElements() != m * ksub) return null
    var acc = 0.0
    var j = 0
    while (j < m) {
      val c = codes.getInt(j)
      if (c < 1 || c > ksub) return null
      acc += lutArr.getDouble(j * ksub + c - 1)
      j += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

/** `pq_encode(embedding)` → array<int>: the m 1-based codebook rows nearest
  * (euclidean) to each sub-vector — 8 B/vector at m=8 vs 256 B of floats,
  * the corpus-resident representation of the PQ tier. */
case class PqEncode(child: Expression, cbFlat: Array[Double], m: Int, dsub: Int)
    extends UnaryExpression {

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<float|double>, got ${other.sql}")
  }

  @transient private lazy val hcc = PqOps.halfNorms(cbFlat, m, dsub)

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(input: Any): Any =
    PqOps.encode(input.asInstanceOf[ArrayData], isFloat, cbFlat, hcc, m, dsub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = PqOps.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val cbRef = ctx.addReferenceObj("pqCb", cbFlat, "double[]")
    val hccRef = ctx.addReferenceObj("pqHcc", hcc, "double[]")
    val res = ctx.freshName("pqEncodeRes")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $res =
         |  $cls.encode($c, $isFloat, $cbRef, $hccRef, $m, $dsub);
         |${ev.isNull} = $res == null;
         |if (!${ev.isNull}) ${ev.value} = $res;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** `pq_encode_res(embedding, anchor)` → array<int>: [[PqEncode]] of the
  * RESIDUAL embedding − anchor (per-element double subtraction) — the
  * IVFADC corpus pass (Jégou et al. 2011 §III; FAISS IVFPQ). Fusing the
  * subtraction into the encode keeps the corpus-sized pass one native
  * codegen expression: a `zip_with` residual would drop the whole stage to
  * CodegenFallback and allocate an intermediate array per row. */
case class PqEncodeRes(left: Expression, right: Expression,
                       cbFlat: Array[Double], m: Int, dsub: Int)
    extends BinaryExpression {

  private def vecIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private def anchorIsFloat: Boolean = right.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _) | ArrayType(DoubleType, _),
          ArrayType(FloatType, _) | ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_encode_res expects two array<float|double>, got ${l.sql} and ${r.sql}")
  }

  @transient private lazy val hcc = PqOps.halfNorms(cbFlat, m, dsub)

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode_res"

  override def nullSafeEval(vec: Any, anchor: Any): Any =
    PqOps.encodeRes(vec.asInstanceOf[ArrayData], vecIsFloat,
      anchor.asInstanceOf[ArrayData], anchorIsFloat, cbFlat, hcc, m, dsub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = PqOps.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val cbRef = ctx.addReferenceObj("pqCb", cbFlat, "double[]")
    val hccRef = ctx.addReferenceObj("pqHcc", hcc, "double[]")
    val res = ctx.freshName("pqEncodeResRes")
    nullSafeCodeGen(ctx, ev, (v, a) => {
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $res =
         |  $cls.encodeRes($v, $vecIsFloat, $a, $anchorIsFloat, $cbRef, $hccRef, $m, $dsub);
         |${ev.isNull} = $res == null;
         |if (!${ev.isNull}) ${ev.value} = $res;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqEncodeRes =
    copy(left = l, right = r)
}

/** `pq_lut(embedding)` → array<double>: all m·ksub sub-dots of a QUERY
  * vector against the codebook — computed once per query, then every
  * corpus code resolves its approximate dot by m array lookups. */
case class PqLut(child: Expression, cbFlat: Array[Double], m: Int, dsub: Int)
    extends UnaryExpression {

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_lut expects array<float|double>, got ${other.sql}")
  }

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_lut"

  override def nullSafeEval(input: Any): Any =
    PqOps.lut(input.asInstanceOf[ArrayData], isFloat, cbFlat, m, dsub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = PqOps.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val cbRef = ctx.addReferenceObj("pqCb", cbFlat, "double[]")
    val res = ctx.freshName("pqLutRes")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $res =
         |  $cls.lut($c, $isFloat, $cbRef, $m, $dsub);
         |${ev.isNull} = $res == null;
         |if (!${ev.isNull}) ${ev.value} = $res;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

/** `pq_adc(lut, codes)` → double: asymmetric-distance-computation scan
  * step — m lookups + adds per (query, code) pair, no float multiply at
  * all on the corpus side. */
case class PqAdc(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_adc expects (array<double>, array<int>), got ${l.sql} and ${r.sql}")
  }

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc"

  override def nullSafeEval(l: Any, r: Any): Any =
    PqOps.adc(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData], ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = PqOps.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val res = ctx.freshName("pqAdcRes")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double $res = (java.lang.Double) $cls.adc($a, $b, $ksub);
         |${ev.isNull} = $res == null;
         |if (!${ev.isNull}) ${ev.value} = $res.doubleValue();
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdc =
    copy(left = l, right = r)
}

object PqFunctions {
  def pq_encode(e: Column, cbFlat: Array[Double], m: Int, dsub: Int): Column =
    Bridge.column(PqEncode(Bridge.expression(e), cbFlat, m, dsub))
  def pq_encode_res(e: Column, anchor: Column, cbFlat: Array[Double],
                    m: Int, dsub: Int): Column =
    Bridge.column(PqEncodeRes(Bridge.expression(e), Bridge.expression(anchor),
      cbFlat, m, dsub))
  def pq_lut(e: Column, cbFlat: Array[Double], m: Int, dsub: Int): Column =
    Bridge.column(PqLut(Bridge.expression(e), cbFlat, m, dsub))
  def pq_adc(lut: Column, codes: Column, ksub: Int): Column =
    Bridge.column(PqAdc(Bridge.expression(lut), Bridge.expression(codes), ksub))
}
