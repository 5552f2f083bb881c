package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling and splitting — the
  * training-data mixture toolkit (extension surface; no reference
  * counterpart — the reference pipeline ships everything it extracts).
  *
  * Every decision is a pure function of a key column through a portable
  * hash (first 15 hex chars of md5 → 60-bit long, the
  * [[graft.functions.SimHashPortable]] trick), NOT an RNG:
  *
  *  - reproducible across runs, partitionings, cluster sizes, and
  *    ENGINES — DuckDB recomputes the identical hash, so the driver
  *    oracle checks sample membership bit-for-bit;
  *  - a sample/split is a projection + filter: no shuffle, no RNG state,
  *    no per-partition seed coordination at any scale — the predicate
  *    pushes into the scan like any other filter;
  *  - assignment is STABLE: growing the corpus never reassigns an
  *    existing key — the property train/test splits need to avoid
  *    leakage across dataset versions (a rerun with new data keeps every
  *    old key on its old side).
  *
  * The `salt` decouples decisions: different salts give independent
  * hash streams over the same keys (sampling twice with different salts
  * composes like independent draws; the same salt is idempotent).
  */
object Sampling {

  /** Bucket resolution: fractions are exact to 1e-6. */
  val Buckets = 1000000L

  /** Portable 60-bit key hash mapped to [0, Buckets). The DuckDB twin is
    * `pmod(('0x' || substr(md5(key || '/' || salt), 1, 15))::BIGINT, 1000000)`. */
  def hashBucket(key: Column, salt: String): Column =
    pmod(conv(substring(md5(concat(key.cast("string"), lit("/" + salt))), 1, 15), 16, 10)
      .cast("long"), lit(Buckets))

  /** Keep a deterministic `fraction` of rows by key hash. */
  def sampleByHash(df: DataFrame, keyCol: String, fraction: Double,
      salt: String = "sample"): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction=$fraction out of [0,1]")
    df.filter(hashBucket(col(keyCol), salt) < lit((fraction * Buckets).toLong))
  }

  /** Stratified sample: an independent per-stratum rate (training-data
    * mixture weights), `defaultFraction` for unlisted strata. One
    * projection + filter — the mixture needs no shuffle, join, or
    * per-stratum pass at any corpus size. */
  def stratifiedSampleByHash(df: DataFrame, keyCol: String, strataCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 0.0,
      salt: String = "strata"): DataFrame = {
    (fractions.values ++ Seq(defaultFraction)).foreach(f =>
      require(f >= 0.0 && f <= 1.0, s"fraction $f out of [0,1]"))
    val threshold = fractions.foldLeft(lit((defaultFraction * Buckets).toLong)) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === stratum, lit((f * Buckets).toLong)).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol), salt) < threshold)
  }

  /** Stable train/validation/test assignment: adds a `split` column from
    * disjoint hash ranges ([0, val) → "val", [val, val+test) → "test",
    * rest → "train"). A projection — composes with any downstream op. */
  def withSplit(df: DataFrame, keyCol: String,
      valFraction: Double = 0.05, testFraction: Double = 0.05,
      salt: String = "split"): DataFrame = {
    require(valFraction >= 0 && testFraction >= 0 &&
      valFraction + testFraction <= 1.0,
      s"val=$valFraction test=$testFraction must be non-negative and sum <= 1")
    val b = hashBucket(col(keyCol), salt)
    val valEnd = (valFraction * Buckets).toLong
    val testEnd = valEnd + (testFraction * Buckets).toLong
    df.withColumn("split",
      when(b < valEnd, lit("val"))
        .when(b < testEnd, lit("test"))
        .otherwise(lit("train")))
  }
}
