package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class JsonlScanSpec extends SparkSpec {
  import spark.implicits._

  private def docs =
    Scan.table(spark, "/root/testdata/sf0.001", "documents")

  test("jsonl round-trips the documents table exactly, schema-first") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    docs.write.mode("overwrite").json(s"$dir/d")
    // cache: Spark disallows queries whose referenced columns are ONLY
    // the corrupt record column (the count below prunes to exactly
    // that) — materialize first, the documented pattern
    val back = Scan.jsonl(spark, s"$dir/d", docs.schema).cache()
    assert(back.columns.last == "_corrupt_record")
    assert(back.filter(col("_corrupt_record").isNotNull).count() == 0)
    val a = docs.select(docs.columns.sorted.map(col): _*)
    val b = back.drop("_corrupt_record")
      .select(docs.columns.sorted.map(col): _*)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("malformed lines quarantine into the corrupt column, never poison the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_bad").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/mixed.jsonl"),
      """{"doc_id": 1, "text": "ok one"}
        |this is not json at all
        |{"doc_id": 2, "text": "ok two"}
        |{"doc_id": 3, "text": "truncated
        |""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val got = Scan.jsonl(spark, s"$dir/mixed.jsonl", schema).cache()
    assert(got.count() == 4)
    val good = got.filter(col("_corrupt_record").isNull)
    assert(good.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    // the dead-letter half: raw lines preserved verbatim for triage
    val bad = got.filter(col("_corrupt_record").isNotNull)
      .select("_corrupt_record").as[String].collect()
    assert(bad.length == 2)
    assert(bad.exists(_.contains("not json")))
    assert(bad.forall(l => l.nonEmpty))
    // data columns of quarantined rows are null, not garbage
    assert(got.filter(col("_corrupt_record").isNotNull &&
      col("text").isNotNull).count() == 0)
  }

  test("gzipped JSONL (the usual crawl-dump shape) reads transparently") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_gz").toString
    docs.write.mode("overwrite")
      .option("compression", "gzip").json(s"$dir/d")
    // sanity: the files really are .gz (whole-file codec — splittable
    // parallelism comes from the many part files, not intra-file splits)
    val parts = new java.io.File(s"$dir/d").listFiles()
      .filter(_.getName.endsWith(".json.gz"))
    assert(parts.nonEmpty)
    val back = Scan.jsonl(spark, s"$dir/d", docs.schema).drop("_corrupt_record")
    val a = docs.select(docs.columns.sorted.map(col): _*)
    val b = back.select(docs.columns.sorted.map(col): _*)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("a glob path reads its matches — never a silently empty relation") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_glob").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "a.jsonl"), """{"doc_id":1}""" + "\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "b.jsonl"), """{"doc_id":2}""" + "\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "c.txt"), "not json\n")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType)))
    // fs.exists(glob) is false even with matches — the r14 bug read
    // this spelling as an empty relation (silent row loss)
    val got = Scan.jsonl(spark, s"$dir/*.jsonl", schema).cache()
    assert(got.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    // a glob matching NOTHING is a legitimately empty input (the
    // zero-file-dir tolerance contract), typed as usual
    val none = Scan.jsonl(spark, s"$dir/*.jsonl.gz", schema)
    assert(none.isEmpty && none.columns.toSeq == Seq("doc_id", "_corrupt_record"))
  }

  test("missing path yields a typed empty relation; reserved column guards") {
    val schema = docs.schema
    val empty = Scan.jsonl(spark, "/tmp/graft_no_such_jsonl_dir", schema)
    assert(empty.count() == 0)
    assert(empty.columns.toSeq ==
      schema.fieldNames.toSeq :+ "_corrupt_record")
    val clash = org.apache.spark.sql.types.StructType(schema.fields :+
      org.apache.spark.sql.types.StructField("_corrupt_record",
        org.apache.spark.sql.types.StringType))
    assertThrows[IllegalArgumentException] {
      Scan.jsonl(spark, "/tmp/whatever", clash)
    }
  }
}
