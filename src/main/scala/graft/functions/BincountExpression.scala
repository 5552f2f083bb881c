package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `array_bincount(xs, n)` — the length-`n` histogram of an int-array:
  * `out(b) = |{i : xs(i) = b}|`, one pass, O(|xs| + n).
  *
  * Semantically ≡ the HOF fold
  * `aggregate(xs, array_repeat(0, n), (acc, v) -> zip_with(acc, seq,
  * (c, b) -> c + if(v = b, 1, 0)))` — the spelling
  * [[graft.operators.QualityClassifier.fit]] used, which re-walks the
  * whole n-wide accumulator per element (O(|xs|·n) adds through an
  * interpreted lambda tree; measured ~0.5 s per materialization of a
  * 300-doc fit sample at n = 128, recomputed four times across the
  * L-BFGS setup — for ~2 ms of actual counting). Counts are integers,
  * so the two spellings are bit-identical (QualityClassifierSpec
  * asserts equality). Null or out-of-range elements count nowhere,
  * matching the fold's `if(v = b)` contribution of zero. */
case class ArrayBincount(child: Expression, n: Int)
  extends UnaryExpression {
  require(n >= 1, s"n=$n must be >= 1")

  override def prettyName: String = "array_bincount"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"array_bincount expects array<int>, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    ArrayBincount.compute(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ArrayBincount.compute($c, $n);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object ArrayBincount {
  /** Static so the generated Java can call it directly. */
  def compute(xs: ArrayData, n: Int): ArrayData = {
    val counts = new Array[Int](n)
    val len = xs.numElements()
    var i = 0
    while (i < len) {
      if (!xs.isNullAt(i)) {
        val b = xs.getInt(i)
        if (b >= 0 && b < n) counts(b) += 1
      }
      i += 1
    }
    new GenericArrayData(counts.map(Integer.valueOf): Array[Any])
  }
}

/** `array_bincount_freq(xs, n)` — the L1-ish normalized histogram
  * `out(b) = count(b) / max(|xs|, 1)`, one pass.
  *
  * Semantically ≡ `transform(array_bincount(xs, n), c -> c /
  * greatest(size(xs), 1))` with the count cast int→double before the
  * divide (same IEEE quotient bit-for-bit). Exists because the HOF
  * divide captured the token-count expression inside its lambda, and
  * lambda bodies are re-evaluated PER ELEMENT — the captured
  * `size(split(text))` re-tokenized the document once per bucket
  * (O(buckets · tokens); measured ~0.45 s of a 0.65 s fit-sample
  * materialization at 128 buckets, for ~2 ms of real work). */
case class ArrayBincountFreq(child: Expression, n: Int)
  extends UnaryExpression {
  require(n >= 1, s"n=$n must be >= 1")

  override def prettyName: String = "array_bincount_freq"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"array_bincount_freq expects array<int>, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    ArrayBincountFreq.compute(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ArrayBincountFreq.compute($c, $n);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object ArrayBincountFreq {
  /** Static so the generated Java can call it directly. */
  def compute(xs: ArrayData, n: Int): ArrayData = {
    val counts = new Array[Int](n)
    val len = xs.numElements()
    var i = 0
    while (i < len) {
      if (!xs.isNullAt(i)) {
        val b = xs.getInt(i)
        if (b >= 0 && b < n) counts(b) += 1
      }
      i += 1
    }
    val div = math.max(len, 1).toDouble
    val out = new Array[Any](n)
    var b = 0
    while (b < n) { out(b) = counts(b).toDouble / div; b += 1 }
    new GenericArrayData(out)
  }
}
