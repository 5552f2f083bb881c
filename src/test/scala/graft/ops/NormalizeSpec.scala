package graft.ops

import org.apache.spark.sql.types._

import graft.SparkSpec

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("ensureCols adds only missing columns with the fill literal") {
    val df = Seq(("a", "x")).toDF("Id", "Status")
    val out = Normalize.ensureCols(df, Seq("Status", "Priority"))
    assert(out.columns.toSeq == Seq("Id", "Status", "Priority"))
    val row = out.collect().head
    assert(row.getString(1) == "x") // untouched
    assert(row.getString(2) == "UNKNOWN")
  }

  test("castMetrics: present → double (null on failure), absent → 0.0") {
    val df = Seq(("1.5", "a"), ("oops", "b")).toDF("Amount", "Id")
    val out = Normalize.castMetrics(df, Seq("Amount", "Missing"))
    assert(out.schema("Amount").dataType == DoubleType)
    assert(out.schema("Missing").dataType == DoubleType)
    val rows = out.orderBy("Id").collect()
    assert(rows(0).getDouble(0) == 1.5)
    assert(rows(1).isNullAt(0)) // tolerant cast
    assert(rows.forall(_.getDouble(2) == 0.0))
  }

  test("temporalsToString casts timestamp/date columns to string only") {
    val df = Seq(("a", java.sql.Timestamp.valueOf("2024-01-01 10:30:00"),
        java.sql.Date.valueOf("2024-02-03"), 7))
      .toDF("Id", "ts", "d", "n")
    val out = Normalize.temporalsToString(df)
    assert(out.schema("ts").dataType == StringType)
    assert(out.schema("d").dataType == StringType)
    assert(out.schema("n").dataType == IntegerType)
    val row = out.collect().head
    assert(row.getString(1).startsWith("2024-01-01 10:30:00"))
    assert(row.getString(2) == "2024-02-03")
  }
}
