package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `minhash_signature(shingles, k)` — the k-slot MinHash signature
  * (Broder 1997) as a native expression: one tight primitive loop per
  * row instead of a higher-order-function composition.
  *
  * Rationale (SURVEY §7.3): the HOF spelling
  * `aggregate(transform(sh, xxhash64), k-mins, zip_with(least(...)))` is
  * CodegenFallback — every (shingle, slot) pair walks an interpreted
  * lambda tree with boxing, measured ~6 s for a 5 000-doc × 54-shingle ×
  * 32-slot signature stage that is ~10 ms of actual hashing. Here each
  * shingle is string-hashed once (XXH64, seed 42 — the engine's hash
  * throughout) and slot i takes the min of the cheap long re-hash
  * `XXH64.hashLong(h, i)`; the generated code is the same loop the
  * interpreter was emulating, inside whole-stage codegen.
  *
  * Null/empty semantics: null array → null; null elements are skipped;
  * slots with no contributing shingle stay Long.MaxValue (the sentinel
  * the LSH layer already treats as "no signature").
  */
case class MinHashSignature(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1 && k <= 1024, s"k=$k out of range")

  override def prettyName: String = "minhash_signature"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects array<string>, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    MinHashSignature.compute(v.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSignature.compute($c, $k);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object MinHashSignature {
  /** Static so the generated Java can call it directly. */
  def compute(arr: ArrayData, k: Int): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val s = arr.getUTF8String(j)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var i = 0
        while (i < k) {
          val v = XXH64.hashLong(h, i.toLong)
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins)
  }
}
