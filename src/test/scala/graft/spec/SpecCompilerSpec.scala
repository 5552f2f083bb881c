package graft.spec

import scala.collection.immutable.ListMap

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SpecCompilerSpec extends AnyFunSuite {

  test("registry has the reference's 23 specs") {
    assert(SpecRegistry.specs.size == 23)
    assert(SpecRegistry("Opportunity").groupBy == Seq("StageName"))
    assert(SpecRegistry("Event").metrics.contains(ObjectSpec.DurationHours))
    intercept[IllegalArgumentException](SpecRegistry("Nope"))
  }

  test("outputName: prefixes, lower-casing, count folding, duration dispatch") {
    assert(SpecCompiler.outputName("Amount", "sum").contains("sum_amount"))
    assert(SpecCompiler.outputName("Amount", "mean").contains("avg_amount"))
    assert(SpecCompiler.outputName("Amount", "min").contains("min_amount"))
    assert(SpecCompiler.outputName("Amount", "MAX").contains("max_amount"))
    assert(SpecCompiler.outputName("Amount", "count").isEmpty) // folds into records
    assert(SpecCompiler.outputName(ObjectSpec.DurationHours, "mean")
      .contains("avg_duration_hours"))
    intercept[IllegalArgumentException](SpecCompiler.outputName("X", "median"))
  }

  test("buildAggs: records counter first, metric order preserved") {
    val metrics = ListMap(
      "Quantity" -> Seq("sum"),
      "UnitPrice" -> Seq("mean"),
      "TotalPrice" -> Seq("sum", "count"))
    val aggs = SpecCompiler.buildAggs(metrics)
    val names = aggs.map(_.toString)
    assert(names.head.contains("records"))
    assert(aggs.size == 4) // records + sum + avg + sum (count folded)
  }

  test("emptyOutputSchema: keys string, metrics double, records long") {
    val spec = SpecRegistry("Opportunity")
    val sch = SpecCompiler.emptyOutputSchema(spec)
    assert(sch.fieldNames.toSeq ==
      Seq("StageName", "sum_amount", "avg_amount", "records"))
    assert(sch("StageName").dataType == StringType)
    assert(sch("sum_amount").dataType == DoubleType)
    assert(sch("records").dataType == LongType)
  }

  test("emptyOutputSchema: duration pseudo-column") {
    val sch = SpecCompiler.emptyOutputSchema(SpecRegistry("Event"))
    assert(sch.fieldNames.toSeq ==
      Seq("OwnerId", "sum_duration_hours", "avg_duration_hours", "records"))
  }
}
