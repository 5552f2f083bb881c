package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.{hilbert_index, z_interleave}

/** Multi-dimensional clustered data layout — Z-order (Morton-curve)
  * writes, the file-skipping lever the other operators assume the
  * storage layer provides.
  *
  * At 100 TB the scan you avoid is worth more than any plan tweak to
  * the scan you run: parquet readers prune row groups / files whose
  * min/max stats exclude a predicate, but stats only carry information
  * when the write CLUSTERED the data. A plain `sortWithinPartitions(a)`
  * clusters column `a` alone; a multi-tenant query mix (`user_id = ?`,
  * `ts BETWEEN ?`, both) wants every filtered column clustered at once.
  * Z-ordering interleaves the bits of per-column ranks
  * ([[graft.functions.ZValueInterleave]]) so file ranges stay narrow in
  * EVERY dimension — each file covers a small hyper-rectangle instead
  * of a thin full-width slice.
  *
  * Rank construction per column type:
  *  - numeric / timestamp / date → equi-width range buckets over the
  *    measured [min, max] (one aggregate-sized pass, folded into the
  *    plan through the lazy-scalar `crossJoin(broadcast(...))` idiom —
  *    no eager driver action): range AND equality predicates prune.
  *  - string / other → hash buckets (`xxhash64 mod 2^bits`): equality
  *    predicates prune (equal values share a bucket); range predicates
  *    on strings do not — documented trade, same as Delta/Hudi's
  *    hash-mode columns.
  *
  * Nulls rank as bucket 0 (they cluster together at the curve origin).
  * Equi-width (not equi-depth) buckets are deliberate: ranks come from
  * one min/max pass, no quantile sketch, and a skewed dimension costs
  * resolution in ITS bits only — the interleave still separates the
  * other dimensions. The write is one range exchange + per-file local
  * sort on the z-key — the same shuffle budget as any clustered write.
  */
object Layout {

  /** Numeric view of a range-rankable column: DATE → epoch days
    * (`unix_date` — a direct DATE→DOUBLE cast is not a legal Spark
    * cast), everything else casts. Shared by the rank and the min/max
    * stats so they can never disagree. */
  private def numericView(df: DataFrame, name: String): Column =
    df.schema(name).dataType match {
      case org.apache.spark.sql.types.DateType =>
        unix_date(col(name)).cast("double")
      case _ => col(name).cast("double")
    }

  /** Per-column rank in `[0, 2^bits)` — see the object doc for the
    * per-type construction. */
  private def rankCol(df: DataFrame, name: String, bits: Int): Column = {
    val buckets = 1L << bits
    df.schema(name).dataType match {
      case _: org.apache.spark.sql.types.NumericType |
          org.apache.spark.sql.types.TimestampType |
          org.apache.spark.sql.types.DateType =>
        val v = numericView(df, name)
        val lo = col(s"__zlo_$name"); val hi = col(s"__zhi_$name")
        // lo == hi → division null → coalesce to 0 (single-value dim)
        val scaled = floor((v - lo) / (hi - lo) * buckets).cast("long")
        coalesce(least(greatest(scaled, lit(0L)), lit(buckets - 1L)), lit(0L))
      case _ =>
        coalesce(pmod(xxhash64(col(name)), lit(buckets)), lit(0L))
    }
  }

  /** Columns whose ranks need the min/max scalars. */
  private def rangedCols(df: DataFrame, cols: Seq[String]): Seq[String] =
    cols.filter(n => df.schema(n).dataType match {
      case _: org.apache.spark.sql.types.NumericType |
          org.apache.spark.sql.types.TimestampType |
          org.apache.spark.sql.types.DateType => true
      case _ => false
    })

  /** Adds the z-key as `zCol`: one aggregate-sized min/max subplan
    * broadcast into a pure projection — no shuffle of `df` itself, no
    * driver action. `bits` defaults to the widest interleave that fits
    * a long (≤ 16 per dimension). */
  def withZValue(df: DataFrame, cols: Seq[String], zCol: String = "__zvalue",
      bits: Int = -1, curve: String = "morton"): DataFrame = {
    require(cols.nonEmpty, "z-order needs at least one column")
    require(curve == "morton" || curve == "hilbert",
      s"unknown curve '$curve' (expected 'morton' or 'hilbert')")
    require(cols.forall(df.columns.contains),
      s"z-order columns ${cols.filterNot(df.columns.contains)} absent from input")
    require(!df.columns.contains(zCol), s"reserved column name in input: $zCol")
    val b = if (bits > 0) bits else math.min(16, 63 / cols.size)
    require(cols.size * b <= 63, s"${cols.size} dims × $b bits exceed a long")
    val ranged = rangedCols(df, cols)
    val withStats = if (ranged.isEmpty) df else {
      val aggs = ranged.flatMap { n =>
        Seq(min(numericView(df, n)).as(s"__zlo_$n"),
          max(numericView(df, n)).as(s"__zhi_$n"))
      }
      df.crossJoin(broadcast(df.select(cols.map(col): _*).agg(aggs.head, aggs.tail: _*)))
    }
    val ranks = cols.map(n => rankCol(df, n, b))
    val key =
      if (curve == "hilbert") hilbert_index(ranks, b) else z_interleave(ranks, b)
    withStats
      .withColumn(zCol, key)
      .drop(ranged.flatMap(n => Seq(s"__zlo_$n", s"__zhi_$n")): _*)
  }

  /** The clustered frame [[writeZOrdered]]/[[optimize]] materialize:
    * range-exchange on the z-key into `numFiles` slices, local sort
    * per slice. */
  private def clustered(df: DataFrame, cols: Seq[String], numFiles: Int,
      bits: Int, curve: String): DataFrame = {
    require(numFiles > 0, s"numFiles=$numFiles must be positive")
    withZValue(df, cols, bits = bits, curve = curve)
      .repartitionByRange(numFiles, col("__zvalue"))
      .sortWithinPartitions("__zvalue")
      .drop("__zvalue")
  }

  /** Z-ordered clustered write: range-exchange on the z-key into
    * `numFiles` output slices, local sort per slice, parquet. Content
    * is preserved row-for-row (layout only); every file's min/max
    * window is narrow in every z-dimension — the property
    * [[fileStats]] measures and the spec asserts.
    *
    * Published via [[IndexFs.publishRelation]] (write-then-swap), for
    * two reasons at once: a rewrite that crashes mid-write leaves the
    * PREVIOUS dataset intact and resolvable (never neither — deleting
    * first would destroy the only complete copy before the new one
    * exists), and a stale marker-protocol pointer from a previous
    * [[optimize]] is superseded rather than left shadowing the new
    * data. Read the result through [[readPruned]] or
    * [[IndexFs.resolveDir]] on marker-protocol deployments (rename
    * protocol keeps the plain dir, so a direct read works there). */
  def writeZOrdered(df: DataFrame, cols: Seq[String], path: String,
      numFiles: Int, bits: Int = -1, curve: String = "morton"): Unit =
    IndexFs.publishRelation(clustered(df, cols, numFiles, bits, curve), path)

  /** The cheap INGEST path of a clustered dataset: appends `df`'s rows
    * as plain unclustered files — batch-cost, no re-cluster — at the
    * price of layout drift: the appended files' stat windows span the
    * full range in every dimension, so pruning degrades as appends
    * accumulate (exactly the frozen-family drift of the ANN indexes,
    * for files). [[optimize]] is the reset. Single-writer vs
    * optimize, like the index plain appends. */
  def appendUnclustered(df: DataFrame, path: String): Unit =
    df.write.mode("append")
      .parquet(IndexFs.resolveDir(df.sparkSession, path))

  /** The maintenance reset — Delta's OPTIMIZE ZORDER shape: reads the
    * CURRENT dataset (accumulated appends included), re-clusters the
    * whole of it on `cols`, and swaps the result in atomically via
    * [[IndexFs.publishRelation]] — readers resolve the complete old
    * layout or the complete new one, never a mix, and a crash
    * mid-optimize leaves the old one intact. Content-preserving by
    * construction (hash-gated in q_zorder_optimize); cost is one full
    * read + clustered write — dataset-linear, a deliberate maintenance
    * window off the ingest path, same posture as the index refits. */
  def optimize(spark: org.apache.spark.sql.SparkSession, path: String,
      cols: Seq[String], numFiles: Int, bits: Int = -1,
      curve: String = "morton"): Unit = {
    val all = spark.read.parquet(IndexFs.resolveDir(spark, path))
    IndexFs.publishRelation(clustered(all, cols, numFiles, bits, curve), path)
  }

  /** Per-file min/max of the given columns for a written dataset — the
    * pruning-power diagnostic (what a stats-based reader would skip
    * with). One column-pruned scan; output is file-count-sized. */
  def fileStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { n =>
      Seq(min(col(n)).as(s"min_$n"), max(col(n)).as(s"max_$n"))
    }
    df.groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** The files of a parquet dataset whose FOOTER stats admit rows with
    * `column ∈ [lo, hi]` — file-level skipping from metadata alone, no
    * data pages touched. This is the read-side payoff of
    * [[writeZOrdered]]: Spark's own parquet reader prunes row groups
    * AFTER opening every file; pre-selecting files here also removes
    * the per-file open/footer/schedule cost from the query, which at
    * 100 TB × narrow predicate is most of the scan. A file is KEPT
    * when any row group's [min, max] intersects [lo, hi], when the
    * column chunk carries no usable stats, or when the column is
    * absent — pruning may only ever widen the result, never narrow it
    * (the caller re-applies the exact filter). Integer-backed columns
    * only (int/long/date/timestamp-as-micros) — exactly the types
    * [[withZValue]] range-ranks; string dims are hash-ranked, so range
    * stats carry no signal for them.
    *
    * Driver-side footer reads, O(files) metadata ops — the same
    * metadata plane a table format (Delta/Iceberg) would serve from a
    * manifest; at a 100k-file dataset this is listing + 100k footer
    * GETs, amortized by caching the (file → ranges) map per snapshot
    * (it is immutable once written). Returns (selected, total). */
  def prunedFiles(spark: org.apache.spark.sql.SparkSession, path: String,
      column: String, lo: Long, hi: Long): (Seq[String], Int) = {
    import scala.jdk.CollectionConverters._
    import org.apache.parquet.column.statistics.{IntStatistics, LongStatistics}
    require(lo <= hi, s"empty range: lo=$lo > hi=$hi")
    val resolved = IndexFs.resolveDir(spark, path) // follow a publish pointer
    val fs = IndexFs.fs(spark, resolved)
    val conf = spark.sparkContext.hadoopConfiguration
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(resolved))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getPath).sortBy(_.getName)
    val selected = files.filter { p =>
      val footer = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
        conf, p,
        org.apache.parquet.format.converter.ParquetMetadataConverter.NO_FILTER)
      footer.getBlocks.asScala.exists { block =>
        block.getColumns.asScala
          .find(_.getPath.toDotString == column) match {
          case None => true // column absent → cannot rule the file out
          case Some(chunk) => chunk.getStatistics match {
            case ls: LongStatistics if ls.hasNonNullValue =>
              ls.getMax >= lo && ls.getMin <= hi
            case is: IntStatistics if is.hasNonNullValue =>
              is.getMax.toLong >= lo && is.getMin.toLong <= hi
            case s if s != null && !s.hasNonNullValue && s.getNumNulls > 0 =>
              false // a wholly-null chunk holds no value in any range
            case _ => true // no usable stats → keep (safe)
          }
        }
      }
    }
    (selected.map(_.toString).toSeq, files.length)
  }

  /** Reads only the [[prunedFiles]] of a dataset — a SUPERSET of the
    * rows with `column ∈ [lo, hi]` (whole files; re-apply the exact
    * filter). Empty selection → an empty frame with the dataset's
    * schema. */
  def readPruned(spark: org.apache.spark.sql.SparkSession, path: String,
      column: String, lo: Long, hi: Long): DataFrame = {
    val (selected, _) = prunedFiles(spark, path, column, lo, hi)
    if (selected.isEmpty)
      spark.read.parquet(IndexFs.resolveDir(spark, path)).limit(0)
    else spark.read.parquet(selected: _*)
  }
}
