package graft

/** The pinned-calibration integrity gate: [[BenchHarness.calRefSeconds]]
  * is only meaningful for the EXACT micro-calibration workload + default
  * bench config it was measured on — and both live in ordinary code a
  * refactor could touch. This spec computes the live fingerprint
  * ([[Bench.microCalibrationFingerprint]]: canonicalized optimized plan
  * ⊕ default config) and asserts it equals the pin recorded next to the
  * constant, so editing the body, its sizes/seeds, the default cpus, or
  * upgrading Spark (whose planner changes are exactly the kind of silent
  * calibration shift the pin must not survive) fails the build until
  * calRefSeconds is re-measured (CalRefProbe prints both numbers) and
  * BOTH are re-pinned together. */
class BenchFingerprintSpec extends SparkSpec {

  test("the live micro-calibration fingerprint matches the pinned calRefFingerprint") {
    val live = Bench.microCalibrationFingerprint(spark)
    assert(live.length == 32 && live.forall(c => c.isDigit || ('a' to 'f').contains(c)))
    assert(live == BenchHarness.calRefFingerprint,
      s"micro-calibration workload or default bench config changed " +
        s"(live $live vs pinned ${BenchHarness.calRefFingerprint}) — " +
        "re-measure calRefSeconds on an idle host with CalRefProbe and " +
        "re-pin BOTH constants together")
  }

  test("the fingerprint is plan-sensitive: a different workload fingerprints differently") {
    import org.apache.spark.sql.functions._
    // same fingerprinting machinery over a visibly different plan — the
    // sensitivity that makes the pin a guard rather than a constant
    val other = spark.range(0L, 400000L, 1L, 4)
      .select(pmod(xxhash64(col("id")), lit(8192)).as("k"))
      .groupBy(col("k")).count()
    val otherPrint = java.security.MessageDigest.getInstance("MD5")
      .digest((other.queryExecution.optimizedPlan.canonicalized.toString +
        s"|master=local[${Bench.defaultCpus}]" +
        s"|spark.sql.shuffle.partitions=${Bench.defaultCpus}").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(otherPrint != BenchHarness.calRefFingerprint)
  }
}
