package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels for the IVF-PQ index
  * ([[graft.operators.Similarity]]) — the public PQ/ADC construction of
  * Jégou, Douze & Schmid, "Product Quantization for Nearest Neighbor
  * Search" (TPAMI 2011): residual vectors are chopped into `nSub`
  * subvectors, each quantized to its subspace codebook's nearest entry
  * (one byte-ish code per subspace instead of `subDim` floats), and
  * queries score candidates ASYMMETRICALLY — the query side stays
  * exact, the candidate side is looked up from a per-query table
  * (ADC), so scoring a candidate costs `nSub` array reads instead of a
  * `dim`-wide dot product.
  *
  * All three kernels are native expressions with the codebook (a
  * driver-known, aggregate-sized constant — `nSub · nCodes · subDim`
  * doubles) shipped as a codegen reference object, the
  * [[NearestCentroids]] pattern: no shuffle, no join, no UDF in any of
  * them. The decomposition identity that makes the LUT per-QUERY
  * rather than per-(query, cell): `dot(x, q) ≈ dot(c, q) +
  * Σ_m dot(cb[m][code_m], q_m)` — the codebook term does not depend on
  * the coarse cell, only the (cheap, per-probe) `dot(c, q)` does.
  */
object PqKernel {

  /** Codebook in kernel form: (m)(j)(d) — subspace m, code j. */
  type Codebook = Array[Array[Array[Double]]]

  private def elemAt(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** Encode one vector against its coarse centroid: per subspace, the
    * L2-nearest codebook entry of the RESIDUAL subvector (ties → lower
    * code, deterministic). Returns array<int> of nSub codes. Residual
    * (not raw) quantization is the Jégou construction: residual energy
    * is what's left after the coarse assignment, so the same codebook
    * budget buys far lower distortion. */
  def encode(vec: ArrayData, cvec: ArrayData, cb: Codebook,
      vecIsFloat: Boolean, cvecIsFloat: Boolean): ArrayData = {
    val nSub = cb.length
    val subDim = if (nSub == 0) 0 else cb(0)(0).length
    val codes = new Array[Any](nSub)
    var m = 0
    while (m < nSub) {
      val base = m * subDim
      var bestJ = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < cb(m).length) {
        var d2 = 0.0
        var d = 0
        while (d < subDim) {
          val r = elemAt(vec, base + d, vecIsFloat) -
            elemAt(cvec, base + d, cvecIsFloat)
          val diff = r - cb(m)(j)(d)
          d2 += diff * diff
          d += 1
        }
        if (d2 < bestD) { bestD = d2; bestJ = j }
        j += 1
      }
      codes(m) = bestJ
      m += 1
    }
    new GenericArrayData(codes)
  }

  /** Per-QUERY ADC lookup table: `lut[m·K + j] = dot(cb[m][j], q_m)`
    * (K = nCodes), with `‖q‖` appended as the final element so the
    * scorer needs no second pass over the query vector. Computed once
    * per query row, BEFORE the probe explode — `nSub · K · subDim`
    * multiplies per query, amortized over every candidate it scores. */
  def lut(qvec: ArrayData, cb: Codebook, qIsFloat: Boolean): ArrayData = {
    val nSub = cb.length
    val k = if (nSub == 0) 0 else cb(0).length
    val subDim = if (nSub == 0) 0 else cb(0)(0).length
    val out = new Array[Any](nSub * k + 1)
    var m = 0
    while (m < nSub) {
      val base = m * subDim
      var j = 0
      while (j < k) {
        var dot = 0.0
        var d = 0
        while (d < subDim) {
          dot += cb(m)(j)(d) * elemAt(qvec, base + d, qIsFloat)
          d += 1
        }
        out(m * k + j) = dot
        j += 1
      }
      m += 1
    }
    var qq = 0.0
    var i = 0
    val n = qvec.numElements()
    while (i < n) { val x = elemAt(qvec, i, qIsFloat); qq += x * x; i += 1 }
    out(nSub * k) = math.sqrt(qq)
    new GenericArrayData(out)
  }

  /** ADC cosine estimate for one candidate: `(cdot + Σ_m lut[m·K +
    * codes[m]]) / (‖x‖ · ‖q‖)` — nSub array reads, no vector access.
    * Zero norms score 0.0 (the [[NearestCentroids]] cosine
    * convention). `k` is recovered from the lut length. */
  def adcScore(codes: ArrayData, lut: ArrayData, cdot: Double,
      norm: Double): Double = {
    val nSub = codes.numElements()
    if (nSub == 0) return 0.0
    val k = (lut.numElements() - 1) / nSub
    var s = cdot
    var m = 0
    while (m < nSub) {
      s += lut.getDouble(m * k + codes.getInt(m))
      m += 1
    }
    val qnorm = lut.getDouble(lut.numElements() - 1)
    val denom = norm * qnorm
    if (denom == 0.0) 0.0 else s / denom
  }
}

/** `pq_encode(vec, cvec)` — PQ codes of `vec`'s residual against its
  * coarse centroid `cvec` under the constant codebook. */
case class PqEncode(left: Expression, right: Expression,
    cb: PqKernel.Codebook) extends BinaryExpression {

  override def prettyName: String = "pq_encode"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = left.nullable || right.nullable

  private def vecType(dt: DataType): Option[Boolean] = dt match {
    case ArrayType(FloatType, _) => Some(true)
    case ArrayType(DoubleType, _) => Some(false)
    case _ => None
  }
  override def checkInputDataTypes(): TypeCheckResult =
    (vecType(left.dataType), vecType(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"pq_encode expects two float/double array columns, got " +
          s"${left.dataType} / ${right.dataType}")
    }

  private lazy val lF = vecType(left.dataType).get
  private lazy val rF = vecType(right.dataType).get

  override def nullSafeEval(v: Any, c: Any): Any =
    PqKernel.encode(v.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData],
      cb, lF, rF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("cb", cb,
      "double[][][]")
    nullSafeCodeGen(ctx, ev, (v, c) =>
      s"${ev.value} = graft.functions.PqKernel.encode($v, $c, $cbRef, $lF, $rF);")
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

/** `pq_lut(qvec)` — the per-query ADC table (+ ‖q‖ tail element). */
case class PqLut(child: Expression, cb: PqKernel.Codebook)
  extends UnaryExpression {

  override def prettyName: String = "pq_lut"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = child.nullable

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_lut expects a float/double array column, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    PqKernel.lut(v.asInstanceOf[ArrayData], cb, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("cb", cb, "double[][][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.PqKernel.lut($v, $cbRef, $isFloat);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `pq_adc_score(codes, lut, cdot, norm)` — the per-candidate ADC
  * cosine estimate; the hot inner loop of an IVF-PQ probe, codegen'd. */
case class PqAdcScore(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def prettyName: String = "pq_adc_score"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = children.exists(_.nullable)

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _),
          DoubleType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_score expects (array<int>, array<double>, double, " +
          s"double), got $other")
    }

  override def nullSafeEval(codes: Any, lut: Any, cdot: Any,
      norm: Any): Any =
    PqKernel.adcScore(codes.asInstanceOf[ArrayData],
      lut.asInstanceOf[ArrayData], cdot.asInstanceOf[Double],
      norm.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c1, c2, c3, c4) =>
      s"${ev.value} = graft.functions.PqKernel.adcScore($c1, $c2, $c3, $c4);")

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
}
