package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `bucket_search(value, boundaries)` — the rank of `value` against an
  * ASCENDING boundary array: the count of boundaries ≤ value (binary
  * search, O(log n) per row). With n boundaries the result is in
  * `[0, n]`, i.e. the equi-DEPTH bucket index when the boundaries are
  * the (1/b … (b−1)/b) quantiles of the column — the skew-robust rank
  * construction [[graft.operators.Layout]] uses for
  * `rankMode = "equidepth"`: equi-width ranks collapse on a skewed
  * dimension (nearly every row lands in one bucket, so file stats
  * carry no pruning signal there), while quantile boundaries put
  * ~equal rows in every bucket by construction at any distribution.
  *
  * Public construction: SQL `WIDTH_BUCKET`'s generalization to
  * explicit boundaries (Postgres `width_bucket(operand, thresholds)`);
  * the boundaries here come from one `percentile_approx` pass folded
  * into the same lazy-scalar broadcast subplan as the min/max stats.
  *
  * Null value or null boundary array → null (the operator coalesces to
  * bucket 0, its null rule). Boundary ELEMENTS must be non-null and
  * ascending — the operator builds them from `percentile_approx`,
  * which guarantees both; out-of-order boundaries would only mis-rank,
  * never crash.
  */
case class BucketSearch(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "bucket_search"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DoubleType, ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bucket_search expects (double, array<double>), got ($l, $r)")
    }

  override protected def nullSafeEval(v: Any, bs: Any): Any = {
    val arr = bs.asInstanceOf[ArrayData]
    val x = v.asInstanceOf[Double]
    var lo = 0
    var hi = arr.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (x >= arr.getDouble(mid)) lo = mid + 1 else hi = mid
    }
    java.lang.Long.valueOf(lo.toLong)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, bs) => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      s"""
         |int $lo = 0;
         |int $hi = $bs.numElements();
         |while ($lo < $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($v >= $bs.getDouble($mid)) { $lo = $mid + 1; } else { $hi = $mid; }
         |}
         |${ev.value} = (long) $lo;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
