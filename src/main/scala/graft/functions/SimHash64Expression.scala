package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit SimHash over a token array: per-bit majority vote of the
  * tokens' xxhash64 values — bit b of the result is set when strictly
  * more than half the tokens have bit b set.
  *
  * Same contract as the HOF composition in
  * [[GraftFunctions.simhash64HOF]], but one tight loop per row instead of
  * 64 interpreted lambda passes (~50× less per-row overhead — the
  * difference between a 1-scan fingerprint sweep and an interpreter at
  * corpus scale). Token hashing uses the same xxhash64(seed=42) as
  * Spark's `xxhash64` function, so HOF and native forms agree bit-for-bit.
  */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 expects array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val tokens = input.asInstanceOf[ArrayData]
    val n = tokens.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = XxHash64Function.hash(
          tokens.getUTF8String(i), StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1
          b += 1
        }
      }
      i += 1
    }
    var result = 0L
    var b = 0
    while (b < 64) {
      // strict majority of ALL tokens (nulls count toward the total),
      // matching the HOF form's size(hashes) denominator
      if (votes(b) * 2 > n) result |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(result)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
