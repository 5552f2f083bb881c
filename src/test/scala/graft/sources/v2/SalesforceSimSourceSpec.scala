package graft.sources.v2

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.SpecAggregate
import graft.spec.SpecRegistry

class SalesforceSimSourceSpec extends SparkSpec {

  private def read(obj: String, rows: Long = 1000): DataFrame =
    spark.read.format("graft.sources.v2.SalesforceSimSource")
      .option("object", obj).option("rows", rows.toString).load()

  test("schema derives from the spec registry; rows are deterministic") {
    val df = read("Account")
    assert(df.columns.toSeq == SpecRegistry("Account").fields)
    assert(df.schema("AnnualRevenue").dataType.typeName == "double")
    assert(df.schema("Name").dataType.typeName == "string")
    val a = df.orderBy("Id").limit(3).collect().map(_.toSeq)
    val b = read("Account").orderBy("Id").limit(3).collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq) // same seed → same remote "org"
    assert(df.count() == 1000)
  }

  test("column pruning is pushed into the source scan") {
    val df = read("Account").select("Id", "BillingState")
    val scan = df.queryExecution.executedPlan.toString
    // the physical scan reads ONLY the projected columns
    assert(scan.contains("Id") && scan.contains("BillingState"))
    assert(!scan.contains("AnnualRevenue"), s"pruning not pushed:\n$scan")
  }

  test("filters are pushed: no residual Filter node, source applies them") {
    val df = read("Account").filter(col("BillingState") === "alpha")
    val plan = df.queryExecution.executedPlan.toString
    // the source consumed the predicate entirely — Spark plans NO
    // post-scan Filter NODE (the same shape a SOQL WHERE would give);
    // match node syntax, not the word (our description says PushedFilters)
    val filterNode = "(?m)^[\\s+:*()\\d-]*Filter ".r
    assert(filterNode.findFirstIn(plan).isEmpty, s"filter not fully pushed:\n$plan")
    assert(plan.contains("EqualTo(BillingState,alpha)"), plan)
    val vals = df.select("BillingState").distinct().collect().map(_.getString(0))
    assert(vals.toSeq == Seq("alpha"))
    assert(df.count() > 0)
  }

  test("limit is pushed: a single partition serves at most limit rows") {
    val df = read("Account", rows = 100000).limit(7)
    assert(df.count() == 7)
    assert(df.rdd.getNumPartitions == 1) // pushed limit collapses the fan-out
  }

  test("pushed filter + pushed limit: limit bounds EMITTED rows, not the scan range") {
    val df = read("Account", rows = 100000)
      .filter(col("BillingState") === "alpha").limit(7)
    assert(df.count() == 7) // reader keeps scanning until 7 matches
  }

  test("pushed filter on a column pruned from the projection evaluates correctly") {
    // AnnualRevenue (double) is filtered but NOT selected — the reader
    // must resolve its dtype from the full schema, not the pruned one
    val df = read("Account", rows = 2000)
      .filter(col("AnnualRevenue") > 100.0).select("Id")
    val n = df.count()
    val check = read("Account", rows = 2000).select("Id", "AnnualRevenue")
      .collect().count(r => !r.isNullAt(1) && r.getDouble(1) > 100.0)
    assert(n == check)
    // IsNotNull under pruning must see the real ~5% nulls
    val nn = read("Account", rows = 2000)
      .filter(col("AnnualRevenue").isNotNull).select("Id").count()
    val nnCheck = read("Account", rows = 2000).select("AnnualRevenue")
      .collect().count(!_.isNullAt(0))
    assert(nn == nnCheck)
  }

  test("string inequality is NOT claimed: residual Filter evaluates it post-scan") {
    val df = read("Account", rows = 500).filter(col("Name") > "beta")
    val plan = df.queryExecution.executedPlan.toString
    assert("(?m)^[\\s+:*()\\d-]*Filter ".r.findFirstIn(plan).isDefined,
      s"string > must stay a residual Filter:\n$plan")
    assert(df.collect().forall(_.getAs[String]("Name") > "beta"))
  }

  test("the sim source feeds the spec pipeline end-to-end (S1→A1 on a 'remote' org)") {
    val out = SpecAggregate.run(spark, SpecRegistry("Account"), read("Account", 5000))
    val rows = out.collect()
    assert(rows.map(_.getLong(rows.head.fieldIndex("records"))).sum == 5000L)
    assert(out.columns.contains("sum_annualrevenue"))
    // ~5% generated nulls exercised the tolerant aggregation path
    val stats = rows.map(r => r.getDouble(r.fieldIndex("sum_annualrevenue")))
    assert(stats.forall(_ > 0.0))
  }

  test("aggregates are pushed: COUNT/MIN/MAX/SUM become partial scan output") {
    val agg = read("Account", rows = 10000).agg(
      count(lit(1)).as("n"), count(col("AnnualRevenue")).as("nn"),
      min(col("AnnualRevenue")).as("mn"), max(col("AnnualRevenue")).as("mx"),
      sum(col("AnnualRevenue")).as("s"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates"), s"aggregates not pushed:\n$plan")
    assert(plan.contains("COUNT(") && plan.contains("MIN(AnnualRevenue)")
      && plan.contains("SUM(AnnualRevenue)"), plan)
    // correctness against a Scala-side fold of the raw generated column
    val raw = read("Account", rows = 10000).select("AnnualRevenue")
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    val vals = raw.flatten
    val got = agg.collect().head
    assert(got.getLong(0) == 10000L)
    assert(got.getLong(1) == vals.length.toLong)
    assert(got.getDouble(2) == vals.min)
    assert(got.getDouble(3) == vals.max)
    assert(math.abs(got.getDouble(4) - vals.sum) <= math.abs(vals.sum) * 1e-9)
  }

  test("pushed filter composes with pushed aggregate (post-filter partials)") {
    val agg = read("Account", rows = 5000)
      .filter(col("BillingState") === "alpha")
      .agg(count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates"), plan)
    assert(plan.contains("EqualTo(BillingState,alpha)"), plan)
    val expected = read("Account", rows = 5000).select("BillingState")
      .collect().count(r => !r.isNullAt(0) && r.getString(0) == "alpha")
    assert(agg.collect().head.getLong(0) == expected.toLong)
  }

  test("GROUP BY pushes too: per-group partials per partition, Spark merges") {
    val grouped = read("Account", rows = 2000)
      .groupBy("BillingState")
      .agg(count(lit(1)).as("n"), sum(col("AnnualRevenue")).as("s"))
    val plan = grouped.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates"), s"grouped agg not pushed:\n$plan")
    assert(plan.contains("PushedGroupBy: [BillingState]"), plan)
    val raw = read("Account", rows = 2000)
      .select("BillingState", "AnnualRevenue").collect()
    val viaRaw = raw.groupBy(_.getString(0)).view.mapValues { rs =>
      (rs.length.toLong,
        rs.filter(!_.isNullAt(1)).map(_.getDouble(1)).sum)
    }.toMap
    val got = grouped.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == viaRaw.keySet)
    got.foreach { case (k, (n, s)) =>
      assert(n == viaRaw(k)._1)
      assert(math.abs(s - viaRaw(k)._2) <= math.abs(viaRaw(k)._2) * 1e-9)
    }
  }

  test("AVG pushes COMPLETELY on a single-partition scan; partial mode still correct") {
    def read1(rows: Long) = spark.read
      .format("graft.sources.v2.SalesforceSimSource")
      .option("object", "Account").option("rows", rows.toString)
      .option("partitions", "1").load()
    val agg = read1(5000).groupBy(col("BillingState"), col("Industry"))
      .agg(avg(col("AnnualRevenue")).as("a"), count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates") && plan.contains("AVG(AnnualRevenue)"),
      s"AVG not pushed on a 1-partition scan:\n$plan")
    // COMPLETE pushdown: no Spark-side aggregate node remains — the
    // scan's per-group rows ARE the final answer
    assert(!plan.contains("HashAggregate") && !plan.contains("SortAggregate"),
      s"complete pushdown must plan no merge:\n$plan")
    // correctness vs a Scala-side fold of the generated org
    val rows = read1(5000).select("BillingState", "Industry", "AnnualRevenue")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    val expected = rows.groupBy(_._1).map { case (k, vs) =>
      val xs = vs.flatMap(_._2)
      k -> (xs.sum / xs.length, vs.length.toLong)
    }
    val got = agg.collect().map(r =>
      ((r.getString(0), r.getString(1)), (r.getDouble(2), r.getLong(3)))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (k, (a, n)) =>
      assert(got(k)._2 == n)
      assert(math.abs(got(k)._1 - a) <= math.abs(a) * 1e-9, s"avg mismatch at $k")
    }
    // multi-partition: the connector refuses AVG (not partial-mergeable);
    // Spark re-plans avg as sum+count — which DO push — and the answer
    // is identical
    val multi = spark.read.format("graft.sources.v2.SalesforceSimSource")
      .option("object", "Account").option("rows", "5000")
      .option("partitions", "4").load()
      .groupBy(col("BillingState"), col("Industry"))
      .agg(avg(col("AnnualRevenue")).as("a"), count(lit(1)).as("n"))
    val mPlan = multi.queryExecution.executedPlan.toString
    assert(!mPlan.contains("AVG(AnnualRevenue)"),
      s"partial mode must not claim AVG:\n$mPlan")
    val gotMulti = multi.collect().map(r =>
      ((r.getString(0), r.getString(1)), (r.getDouble(2), r.getLong(3)))).toMap
    assert(gotMulti.keySet == expected.keySet)
    expected.foreach { case (k, (a, n)) =>
      assert(gotMulti(k)._2 == n)
      assert(math.abs(gotMulti(k)._1 - a) <= math.abs(a) * 1e-9)
    }
  }

  test("distinct aggregates are NOT claimed — Spark keeps them, correctly") {
    val viaRaw = read("Account", rows = 2000).select("BillingState")
      .collect().groupBy(_.getString(0)).view.mapValues(_.length.toLong).toMap
    val distinctAgg = read("Account", rows = 2000)
      .agg(countDistinct(col("BillingState")).as("d"))
    assert(!distinctAgg.queryExecution.executedPlan.toString
      .contains("PushedAggregates"))
    assert(distinctAgg.collect().head.getLong(0) == viaRaw.size.toLong)
  }

  test("the spec pipeline's grouped aggregation itself engages the pushdown") {
    // S1→A1 end-to-end: SpecAggregate's groupBy/agg over the connector
    // compiles into the scan — the reference's flagship aggregation
    // happens "remotely", rows never cross the wire
    val out = SpecAggregate.run(spark, SpecRegistry("Account"),
      read("Account", 3000))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates"),
      s"spec aggregation did not push into the source:\n$plan")
    assert(out.collect().map(r =>
      r.getLong(r.fieldIndex("records"))).sum == 3000L)
  }

  test("PushedAgg compiles the SOQL aggregate select list") {
    assert(PushedAgg("count_star", None).soql == "COUNT()")
    assert(PushedAgg("count", Some("Id")).soql == "COUNT(Id)")
    assert(PushedAgg("min", Some("AnnualRevenue")).soql == "MIN(AnnualRevenue)")
    val soql = CompiledSoql("Account",
      Seq("COUNT()", "SUM(AnnualRevenue)"),
      Seq(org.apache.spark.sql.sources.EqualTo("BillingState", "alpha")), None)
    assert(soql.toSoql ==
      "SELECT COUNT(), SUM(AnnualRevenue) FROM Account WHERE BillingState = 'alpha'")
  }
}
