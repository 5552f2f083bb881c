package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The two quantile spellings: exact `percentile` (the oracle-gated
  * profile form, q_quantile_profile) and `approx_percentile` (t-digest
  * — mergeable bounded-state sketch, the 100 TB path). The approx form
  * has no portable oracle, so its contract is an error bound against
  * the exact answer here. */
class QuantileSpec extends SparkSpec {

  test("approx_percentile tracks exact percentile within the accuracy bound") {
    val li = graft.sources.Scan.table(spark, "/root/testdata/sf0.001", "lineitem")
    val rows = li.groupBy(col("l_returnflag"))
      .agg(
        percentile(col("l_extendedprice"), lit(0.5)).as("exact"),
        approx_percentile(col("l_extendedprice"), lit(0.5), lit(10000)).as("approx"),
        min(col("l_extendedprice")).as("lo"),
        max(col("l_extendedprice")).as("hi"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (exact, approx) = (r.getDouble(1), r.getDouble(2))
      val span = r.getDouble(4) - r.getDouble(3)
      // accuracy 10000 → rank error ≤ n/10000; value drift bounded by a
      // generous fraction of the group's span
      assert(math.abs(exact - approx) <= span * 0.01,
        s"approx median $approx too far from exact $exact (span $span)")
    }
  }

  test("exact percentile plan: one partial+final hash aggregate, no sort-based fallback") {
    val li = graft.sources.Scan.table(spark, "/root/testdata/sf0.001", "lineitem")
    val plan = li.groupBy(col("l_returnflag"))
      .agg(percentile(col("l_extendedprice"), lit(0.25)).as("p25"))
      .queryExecution.executedPlan.toString
    // percentile is a TypedImperativeAggregate — it plans as an
    // ObjectHashAggregate pair around one exchange
    assert(plan.contains("ObjectHashAggregate") || plan.contains("HashAggregate"), plan)
    assert("Exchange ".r.findAllIn(plan).length == 1, plan)
  }
}
