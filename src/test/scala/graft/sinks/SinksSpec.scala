package graft.sinks

import java.nio.file.{Files, Paths}

import graft.SparkSpec

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("jsonRecords writes the exact [{...}] array shape and returns the count") {
    val dir = Files.createTempDirectory("graft_sinks").toString
    val path = s"$dir/summary.json"
    val n = Sinks.jsonRecords(
      Seq(("a", 1L), ("b", 2L)).toDF("k", "v").orderBy("k"), path)
    assert(n == 2)
    val text = new String(Files.readAllBytes(Paths.get(path)), "UTF-8")
    assert(text.startsWith("[\n") && text.endsWith("\n]"))
    assert(text.contains("""{"k":"a","v":1}""") && text.contains("""{"k":"b","v":2}"""))
  }

  test("jsonRecords refuses inputs past maxRows before collecting (use jsonLines instead)") {
    val dir = Files.createTempDirectory("graft_sinks").toString
    val big = spark.range(0, 100).toDF("id")
    val e = intercept[IllegalArgumentException] {
      Sinks.jsonRecords(big, s"$dir/too_big.json", maxRows = 10)
    }
    assert(e.getMessage.contains("jsonLines"))
    // nothing was materialized on the driver or written to disk
    assert(!Files.exists(Paths.get(s"$dir/too_big.json")))
    // the distributed sink takes the same input fine
    Sinks.jsonLines(big, s"$dir/big_jsonl")
    assert(spark.read.json(s"$dir/big_jsonl").count() == 100)
  }

  test("jsonRecords maxRows=Long.MaxValue means 'no cap', never a silent empty array") {
    // maxRows + 1 must not overflow to a limit(0) probe that writes []
    val dir = Files.createTempDirectory("graft_sinks").toString
    val path = s"$dir/uncapped.json"
    val n = Sinks.jsonRecords(
      Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("k", "v").orderBy("k"),
      path, maxRows = Long.MaxValue)
    assert(n == 3)
    val text = new String(Files.readAllBytes(Paths.get(path)), "UTF-8")
    assert(text.contains("""{"k":"c","v":3}"""))
  }
}
