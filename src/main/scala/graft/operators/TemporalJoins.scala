package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Temporal joins Spark's own API lacks: as-of (nearest-earlier match)
  * and point-in-interval (range) joins — the time-series feature joins
  * a training-data pipeline needs ("label each event with the state
  * that was current when it happened"; "which events fall inside this
  * window"). Both are expressed as plans that stay linear at 100 TB:
  *
  *  - [[asofJoin]] is the union + carry-forward-window spelling: tag
  *    both sides, union, ONE hash exchange on the key, sort within the
  *    partition, and a `last(payload, ignoreNulls)` running window
  *    attaches the nearest right row to every left row in a single
  *    linear scan. No theta join, no per-left-row probe — the naive
  *    `t_right <= t_left` join is a BroadcastNestedLoop/cartesian in
  *    Spark, quadratic per key.
  *  - [[pointInIntervalJoin]] buckets the time axis: intervals explode
  *    into the fixed-width buckets they cover, points map to exactly
  *    one bucket, and the join is an EQUI-join on (key, bucket) with
  *    the exact containment predicate as a residual filter. Shuffle
  *    width tracks the data (× the small per-interval bucket fanout),
  *    never the pair product.
  *
  * Skew note (100 TB): both plans hash-partition by the join key, so a
  * single pathological key concentrates on one task. The carry-forward
  * window resists salting (state crosses salt boundaries); for a known
  * hot key, pre-split the frames and union, or lean on AQE skew
  * handling for the range join's sort-merge exchange.
  */
object TemporalJoins {

  // __rt is not a top-level column but a payload STRUCT FIELD — a
  // payload column literally named __rt would duplicate it inside the
  // struct and break getField("__rt") with an ambiguity the message
  // wouldn't explain, so it is reserved like the real internals
  private val Internal = Seq("__k", "__t", "__side", "__p", "__m", "__rt")

  /** As-of join: for every left row, attach the payload of the right
    * row with the same key and the nearest time at-or-before it
    * (`direction = "backward"`, the default) or at-or-after it
    * (`"forward"`); null payload when no such row exists, or when the
    * matched row is further than `toleranceMicros` away. Output: every
    * left row and column, plus `payloadCols` from the matched right row.
    *
    * Determinism: several right rows on the same (key, time) resolve to
    * the one with the greatest payload tuple (struct ordering) — a total
    * order, so replays hash-identically. Right rows with a null key or
    * time never match; left rows with a null time match nothing.
    *
    * Exactly ONE exchange in the plan (the key hash for the window) —
    * TemporalJoinsSpec pins that and the absence of any nested-loop
    * join. Tolerance requires genuine timestamp columns (micros
    * arithmetic); the match itself works on any orderable time type.
    */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payloadCols: Seq[String],
      toleranceMicros: Option[Long] = None,
      direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be 'backward' or 'forward', got '$direction'")
    require(payloadCols.nonEmpty, "payloadCols must name at least one right column")
    val collisions = payloadCols.filter(left.columns.contains)
    require(collisions.isEmpty,
      s"payload columns collide with left columns: ${collisions.mkString(", ")} " +
        "— alias the right side before joining")
    val reserved = (left.columns ++ right.columns).filter(Internal.contains)
    require(reserved.isEmpty,
      s"reserved internal column names in input: ${reserved.mkString(", ")}")
    toleranceMicros.foreach { _ =>
      require(left.schema(leftTime).dataType == TimestampType &&
        right.schema(rightTime).dataType == TimestampType,
        "toleranceMicros requires timestamp time columns")
    }

    // __rt rides inside the payload so the tolerance check reads the
    // matched row's own time (add rightTime to payloadCols to output it)
    val payloadStruct = struct(
      (col(rightTime).as("__rt") +: payloadCols.map(col)): _*)
    val leftFields = left.schema.fields.toList
    val rightSide = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select((col(rightKey).as("__k") :: col(rightTime).as("__t") ::
        lit(0).as("__side") :: payloadStruct.as("__p") ::
        leftFields.map(f => lit(null).cast(f.dataType).as(f.name))): _*)
    val pType = rightSide.schema("__p").dataType
    val leftSide = left.select((col(leftKey).as("__k") ::
      col(leftTime).as("__t") :: lit(1).as("__side") ::
      lit(null).cast(pType).as("__p") ::
      leftFields.map(f => col(f.name))): _*)

    // Scan order: backward walks time ascending, forward descending —
    // either way the last right row seen at a left row IS the nearest
    // one in that direction. __side keeps right rows ahead of left rows
    // on time ties (at-or-before / at-or-after inclusivity); __p makes
    // same-(key, time) right rows a total order. Null left times sort
    // to the front of the scan (before any right row) → no match.
    val ordering = direction match {
      case "backward" => Seq(col("__t").asc_nulls_first, col("__side").asc,
        col("__p").asc_nulls_first)
      case "forward" => Seq(col("__t").desc_nulls_first, col("__side").asc,
        col("__p").asc_nulls_first)
    }
    val w = Window.partitionBy(col("__k")).orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = last(col("__p"), ignoreNulls = true).over(w)
    val gated = toleranceMicros match {
      case Some(tol) =>
        val delta = direction match {
          case "backward" =>
            unix_micros(col("__t")) - unix_micros(matched.getField("__rt"))
          case "forward" =>
            unix_micros(matched.getField("__rt")) - unix_micros(col("__t"))
        }
        when(delta <= lit(tol), matched) // null delta (no match) → null
      case None => matched
    }

    leftSide.unionByName(rightSide)
      .withColumn("__m", gated)
      .filter(col("__side") === 1)
      .select(leftFields.map(f => col(f.name)) ++
        payloadCols.map(c => col("__m").getField(c).as(c)): _*)
  }

  /** Point-in-interval (range) join: every (point, interval) pair with
    * equal keys and `start <= t < end`. Output: all point columns plus
    * all interval columns — the two frames must have DISJOINT column
    * sets (alias before joining), so the output is unambiguous.
    *
    * The equi-join handle is the time BUCKET: an interval explodes into
    * the `bucketMicros`-wide buckets it covers, a point lives in exactly
    * one bucket (so no pair can match twice — no dedup stage), and the
    * exact containment predicate runs as a residual filter on the
    * equi-join output. Pick `bucketMicros` near the typical interval
    * length: fanout per interval is ceil(len/bucket)+1 ≈ 2 there, and
    * every halving of the bucket doubles fanout but halves the false-
    * candidate rate. An interval spanning more than
    * `maxBucketsPerInterval` buckets fails LOUDLY (raise_error) rather
    * than exploding the shuffle silently — raise the bucket width.
    *
    * Degenerate intervals (`end <= start`) match nothing, as do null
    * keys/endpoints — both filtered before the explode.
    */
  def pointInIntervalJoin(
      points: DataFrame, intervals: DataFrame,
      pointKey: String, pointTime: String,
      intervalKey: String, startCol: String, endCol: String,
      bucketMicros: Long = 86400000000L, // one day
      maxBucketsPerInterval: Int = 1000): DataFrame = {
    require(bucketMicros > 0, "bucketMicros must be positive")
    val shared = points.columns.intersect(intervals.columns)
    require(shared.isEmpty,
      s"points and intervals share column names: ${shared.mkString(", ")} " +
        "— alias one side before joining")
    val reserved = (points.columns ++ intervals.columns)
      .filter(c => c == "__pb" || c == "__ib")
    require(reserved.isEmpty,
      s"reserved internal column names in input: ${reserved.mkString(", ")}")

    // floor-division on the long micros: subtracting the (always
    // non-negative) pmod makes the numerator an exact multiple, so the
    // integral `div` IS the floor — unconditionally exact, no
    // magnitude-dependent double-precision argument needed
    def floorDiv(x: org.apache.spark.sql.Column) =
      call_function("div", x - pmod(x, lit(bucketMicros)), lit(bucketMicros))
    def bucketOf(c: org.apache.spark.sql.Column) = floorDiv(unix_micros(c))

    val p = points
      .filter(col(pointKey).isNotNull && col(pointTime).isNotNull)
      .withColumn("__pb", bucketOf(col(pointTime)))
    val firstB = bucketOf(col(startCol))
    // end is EXCLUSIVE: the last covered instant is end - 1 µs
    val lastB = floorDiv(unix_micros(col(endCol)) - 1)
    val iv = intervals
      .filter(col(intervalKey).isNotNull && col(startCol).isNotNull &&
        col(endCol).isNotNull && col(endCol) > col(startCol))
      .withColumn("__ib", explode(sequence(
        when(lastB - firstB < lit(maxBucketsPerInterval.toLong), firstB)
          .otherwise(raise_error(concat(
            lit(s"pointInIntervalJoin: an interval spans more than " +
              s"$maxBucketsPerInterval buckets of $bucketMicros µs — " +
              "raise bucketMicros (interval start "), col(startCol).cast("string"),
            lit(")")))),
        lastB)))

    p.join(iv,
        col("__pb") === col("__ib") &&
          col(pointKey) === col(intervalKey) &&
          col(pointTime) >= col(startCol) && col(pointTime) < col(endCol))
      .drop("__pb", "__ib")
  }
}
