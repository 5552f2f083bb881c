package graft.ops

import scala.collection.immutable.ListMap

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import graft.SparkSpec
import graft.spec.{ObjectSpec, SpecRegistry}

class SpecAggregateSpec extends SparkSpec {
  import spark.implicits._

  private val oppSpec = SpecRegistry("Opportunity")

  test("grouped aggregate: records counts rows incl. null metrics; sum/avg over non-null") {
    val df = Seq(
      ("a", "Won", Some(10.0)),
      ("b", "Won", None),
      ("c", "Lost", Some(4.0)),
      ("d", "Lost", Some(6.0))
    ).toDF("Id", "StageName", "Amount")
    val out = SpecAggregate.run(spark, oppSpec, df).collect()
    assert(out.map(r => (r.getString(0), r.getLong(r.fieldIndex("records")))).toSeq ==
      Seq(("Lost", 2L), ("Won", 2L))) // sorted by first group key
    val won = out.find(_.getString(0) == "Won").get
    assert(won.getDouble(won.fieldIndex("sum_amount")) == 10.0)
    assert(won.getDouble(won.fieldIndex("avg_amount")) == 10.0) // avg skips nulls
  }

  test("sum over all-null group is 0.0 (Polars parity), not null") {
    val df = Seq(("a", "Won", null.asInstanceOf[java.lang.Double]))
      .toDF("Id", "StageName", "Amount")
    val out = SpecAggregate.run(spark, oppSpec, df).collect().head
    assert(out.getDouble(out.fieldIndex("sum_amount")) == 0.0)
    assert(out.isNullAt(out.fieldIndex("avg_amount")))
  }

  test("missing group key filled with UNKNOWN; missing metric becomes 0.0") {
    val df = Seq(("a"), ("b")).toDF("Id") // no StageName, no Amount
    val out = SpecAggregate.run(spark, oppSpec, df).collect()
    assert(out.length == 1)
    assert(out.head.getString(0) == "UNKNOWN")
    assert(out.head.getLong(out.head.fieldIndex("records")) == 2L)
    assert(out.head.getDouble(out.head.fieldIndex("sum_amount")) == 0.0)
  }

  test("tolerant cast: unparseable metric strings aggregate as null") {
    val df = Seq(("a", "Won", "12.5"), ("b", "Won", "garbage"))
      .toDF("Id", "StageName", "Amount")
    val out = SpecAggregate.run(spark, oppSpec, df).collect().head
    assert(out.getDouble(out.fieldIndex("sum_amount")) == 12.5)
    assert(out.getDouble(out.fieldIndex("avg_amount")) == 12.5)
  }

  test("empty input yields spec-derived schema with zero rows") {
    val df = spark.emptyDataFrame
    val out = SpecAggregate.run(spark, oppSpec, df)
    assert(out.schema.fieldNames.toSeq ==
      Seq("StageName", "sum_amount", "avg_amount", "records"))
    assert(out.count() == 0)
  }

  test("global aggregate (no group keys)") {
    val spec = ObjectSpec("adhoc", Nil, Nil, Nil, ListMap("x" -> Seq("sum", "min", "max")))
    val df = Seq(1.0, 2.0, 3.0).toDF("x")
    val out = SpecAggregate.run(spark, spec, df).collect().head
    assert(out.getLong(out.fieldIndex("records")) == 3L)
    assert(out.getDouble(out.fieldIndex("sum_x")) == 6.0)
    assert(out.getDouble(out.fieldIndex("min_x")) == 1.0)
    assert(out.getDouble(out.fieldIndex("max_x")) == 3.0)
  }

  test("Event rewrite: duration_hours derived from string timestamps, null→0.0") {
    val df = Seq(
      ("e1", "2024-01-01 00:00:00", "2024-01-01 01:30:00", "u1"),
      ("e2", "2024-01-01 00:00:00", null, "u1"), // unparseable end → 0.0
      ("e3", "2024-01-02 10:00:00.500", "2024-01-02 10:00:02.300", "u2") // sub-second
    ).toDF("Id", "StartDateTime", "EndDateTime", "OwnerId")
    val out = SpecAggregate.run(spark, SpecRegistry("Event"), df).collect()
    val u1 = out.find(_.getString(0) == "u1").get
    assert(u1.getDouble(u1.fieldIndex("sum_duration_hours")) == 1.5)
    val u2 = out.find(_.getString(0) == "u2").get
    assert(math.abs(u2.getDouble(u2.fieldIndex("sum_duration_hours")) - 1.8 / 3600.0) < 1e-9)
  }
}
