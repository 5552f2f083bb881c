package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for [[graft.operators.LangIdNb]] — the HOF spelling
  * (`transform` + per-language `aggregate` over a bigram array) runs
  * INTERPRETED (higher-order functions have no codegen) and
  * re-evaluates the bigram/hash transform once per language lambda;
  * measured ~2.4× the whole operator's runtime at 100× corpus. These
  * are one tight loop per row (the [[SimHash64]]/[[BpeTokenCount]]
  * posture): no bigram strings are materialized at all — the loop
  * walks CODEPOINTS (`Character.charCount` stepping, matching Spark's
  * character-counting `substr` and DuckDB's `unicode`) and folds
  * `bucket = (cp_prev · 997 + cp) mod B` directly.
  */

/** `char_bigram_buckets(text)` — the hashed-bigram bucket array (one
  * int per adjacent codepoint pair; empty for length < 2). The FIT
  * side's explode input. */
case class CharBigramBuckets(child: Expression, buckets: Int)
    extends UnaryExpression {

  require(buckets >= 2, s"buckets=$buckets must be >= 2")

  override def prettyName: String = "char_bigram_buckets"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_bigram_buckets expects a string column, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    CharBigramBuckets.compute(v.asInstanceOf[UTF8String], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharBigramBuckets.compute($c, $buckets);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object CharBigramBuckets {
  def compute(s: UTF8String, buckets: Int): ArrayData = {
    val str = s.toString
    val n = str.length
    if (n < 2) return new GenericArrayData(Array.empty[Int])
    val tmp = new Array[Int](n - 1) // pairs = codepoints - 1 <= n - 1
    var k = 0
    var i = 0
    var prev = -1
    while (i < n) {
      val cp = str.codePointAt(i)
      if (prev >= 0) { tmp(k) = ((prev.toLong * 997L + cp) % buckets).toInt; k += 1 }
      prev = cp
      i += Character.charCount(cp)
    }
    new GenericArrayData(
      if (k == tmp.length) tmp else java.util.Arrays.copyOf(tmp, k))
  }
}

/** Serializable NB model state carried by [[NbLangScores]] as a
  * codegen reference object (the [[BpeTable]] pattern). */
final class NbKernel(val logPrior: Array[Double],
    val logProb: Array[Array[Double]], val buckets: Int) extends Serializable {
  require(logProb.length == logPrior.length &&
    logProb.forall(_.length == buckets), "ragged NB kernel")

  /** All language log-posteriors in one pass: priors + Σ log P(b|l)
    * over the row's bigram buckets. UNROUNDED — callers round. */
  def compute(s: UTF8String): ArrayData = {
    val out = logPrior.clone()
    val str = s.toString
    val n = str.length
    val nLangs = out.length
    var i = 0
    var prev = -1
    while (i < n) {
      val cp = str.codePointAt(i)
      if (prev >= 0) {
        val b = ((prev.toLong * 997L + cp) % buckets).toInt
        var l = 0
        while (l < nLangs) { out(l) += logProb(l)(b); l += 1 }
      }
      prev = cp
      i += Character.charCount(cp)
    }
    new GenericArrayData(out)
  }
}

/** `nb_lang_scores(text)` — the per-language log-posterior array for
  * one document under a fitted [[NbKernel]]. */
case class NbLangScores(child: Expression, kernel: NbKernel)
    extends UnaryExpression {

  override def prettyName: String = "nb_lang_scores"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nb_lang_scores expects a string column, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    kernel.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("nbKernel", kernel, classOf[NbKernel].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $k.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
