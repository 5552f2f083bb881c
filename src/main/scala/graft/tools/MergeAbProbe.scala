package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession

/** A/B probe for the merge survivor anti-join spelling: the r13
  * string-key equi-join (`join(keys, keyCols, "left_anti")`, null keys
  * DUPLICATE — the bug) vs the r14 null-safe `<=>` condition join.
  * Isolates whether the r14 bench movement on the merge rows is the
  * join flavor or something else. Usage:
  * `runMain graft.tools.MergeAbProbe [rows] [reps]`. */
object MergeAbProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.lift(0).map(_.toLong).getOrElse(150000L)
    val reps = args.lift(1).map(_.toInt).getOrElse(6)
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val current = spark.range(0L, rows)
      .select(col("id").as("o_orderkey"), (col("id") % 997).as("o_custkey"),
        concat(lit("s"), col("id") % 5).as("o_orderstatus"),
        (col("id") * 1.37).as("o_totalprice"))
      .localCheckpoint(true)
    val keys = spark.range(0L, rows, 3L).select(col("id").as("o_orderkey"))
      .localCheckpoint(true)
    def time(name: String)(body: => Long): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      }
      println(f"MERGEAB $name%-22s min=${ts.min}%.3f med=${ts.sorted.apply(reps / 2)}%.3f")
    }
    time("equi_join") {
      current.join(broadcast(keys), Seq("o_orderkey"), "left_anti").count()
    }
    time("nullsafe_join") {
      // the survivorAntiJoin spelling, inlined (private[operators])
      val keyed = keys.toDF("__mergekey_o_orderkey")
      current.join(broadcast(keyed),
          col("o_orderkey") <=> col("__mergekey_o_orderkey"), "left_anti")
        .count()
    }
    // the WRITE halves, in case the join is innocent: one snapshot-sized
    // parquet write per rep, same bytes both times
    val out = java.nio.file.Files.createTempDirectory("mergeab").toString
    time("plain_write") {
      current.write.mode("overwrite").parquet(s"$out/p"); rows
    }
    time("publish_write") {
      graft.operators.IndexFs.publishRelation(current, s"$out/q"); rows
    }
    spark.stop()
  }
}
