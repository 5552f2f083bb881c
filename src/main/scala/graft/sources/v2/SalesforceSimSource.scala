package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, IsNotNull, LessThan}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.spec.{ObjectSpec, SpecRegistry}

/** DataSource V2 connector modelling the reference's remote Salesforce
  * relation (S1, `tasks/extract.py:66-101`) — the piece SURVEY §2.1 marks
  * "in principle": the SOQL the reference hand-builds (SELECT list /
  * WHERE / LIMIT, `extract.py:29-33`) maps 1:1 onto Spark's
  * `SupportsPushDownRequiredColumns` / `SupportsPushDownFilters` /
  * `SupportsPushDownLimit`, so Catalyst compiles the same pushdowns the
  * reference encodes manually.
  *
  * Zero-egress stand-in: rows come from a deterministic per-object
  * generator (seeded by object name + row index) instead of the wire —
  * the connector's *architecture* (schema from the spec registry,
  * pruning/filter/limit pushed into the "remote" fetch, partitioned
  * parallel reads) is exactly what a live `simple_salesforce` backend
  * would slot into.
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.v2.SalesforceSimSource")
  *   .option("object", "Account").option("rows", "10000").load()
  * }}}
  */
class SalesforceSimSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SalesforceSim.schemaFor(SalesforceSim.specFrom(options))

  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    // the backend seam: `sim` (default, zero-egress generator) or `live`
    // (typed env credentials per extract.py:35-42; fetch needs egress)
    val backend: SalesforceBackend = opts.getOrDefault("backend", "sim") match {
      case "sim" => new SimBackend
      case "live" => new LiveSalesforceBackend(EnvCredentials.fromEnv())
      case other => throw new IllegalArgumentException(
        s"unknown backend '$other' (expected 'sim' or 'live')")
    }
    new SimTable(SalesforceSim.specFrom(opts),
      opts.getLong("rows", 1000L), opts.getInt("partitions", 4), backend)
  }
}

object SalesforceSim {
  def specFrom(options: CaseInsensitiveStringMap): ObjectSpec = {
    val objectName = Option(options.get("object")).getOrElse(
      throw new IllegalArgumentException("option 'object' is required"))
    SpecRegistry(objectName)
  }

  /** Spec-derived schema: metric columns double, everything else string
    * (the reference's CSV-era typing; SURVEY §1.2). */
  def schemaFor(spec: ObjectSpec): StructType = {
    val metricCols = spec.metrics.keySet.filter(_ != ObjectSpec.DurationHours)
    StructType(spec.fields.map { f =>
      StructField(f,
        if (metricCols.contains(f)) DoubleType else StringType,
        nullable = true)
    })
  }

  private val pools: Map[String, Seq[String]] = Map(
    "default" -> Seq("alpha", "beta", "gamma", "delta", "epsilon"))

  /** Deterministic cell value for (object, rowIdx, field). */
  def cell(objectName: String, i: Long, field: String, dt: DataType): Any = {
    val h = (objectName + "/" + field).hashCode.toLong * 1315423911L + i * 2654435761L
    dt match {
      case DoubleType =>
        // ~5% nulls to exercise tolerant aggregation
        if (math.floorMod(h, 20L) == 0L) null
        else java.lang.Double.valueOf((math.floorMod(h, 1000000L)) / 100.0)
      case _ =>
        if (field == "Id") UTF8String.fromString(s"$objectName-$i")
        else {
          val pool = pools("default")
          UTF8String.fromString(pool((math.floorMod(h, pool.size.toLong)).toInt))
        }
    }
  }
}

class SimTable(spec: ObjectSpec, rows: Long, partitions: Int,
    backend: SalesforceBackend = new SimBackend)
  extends Table with SupportsRead {
  override def name(): String = s"salesforce_sim.${spec.apiName}"
  override def schema(): StructType = SalesforceSim.schemaFor(spec)
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SimScanBuilder(spec, rows, partitions, backend)
}

/** One pushed-down aggregate: `fn` ∈ count_star | count | min | max |
  * sum | avg, `col` the referenced field (None for count_star). `soql`
  * is the SOQL aggregate expression the live wire would run —
  * Salesforce SOQL supports exactly these (`SELECT COUNT(Id),
  * MIN(Amount), AVG(Amount) FROM …`). `avg` is COMPLETE-pushdown-only:
  * per-partition AVG partials are not mergeable (averaging averages
  * loses the weights), so it is offered only when the scan is a single
  * partition and its answer is final — see
  * [[SimScanBuilder.supportCompletePushDown]]. */
private[v2] final case class PushedAgg(fn: String, col: Option[String]) {
  def soql: String = fn match {
    case "count_star" => "COUNT()"
    case "count" => s"COUNT(${col.get})"
    case other => s"${other.toUpperCase}(${col.get})"
  }
}

/** The SOQL compiler's Spark form: each pushdown callback is one clause
  * of the SOQL the reference builds by hand. */
class SimScanBuilder(spec: ObjectSpec, rows: Long, partitions: Int,
    backend: SalesforceBackend)
  extends ScanBuilder
  with SupportsPushDownRequiredColumns
  with SupportsPushDownFilters
  with SupportsPushDownLimit
  with SupportsPushDownAggregates {

  private var requiredSchema: StructType = SalesforceSim.schemaFor(spec)
  private var pushed: Array[Filter] = Array.empty
  private var limit: Long = -1L
  private var pushedAggs: Option[Seq[PushedAgg]] = None
  private var pushedGroupBy: Seq[String] = Nil

  // ≙ SELECT <fields> (extract.py:30)
  override def pruneColumns(required: StructType): Unit = {
    requiredSchema = required
  }

  // ≙ WHERE ... (extract.py:31) — the simulator evaluates EqualTo /
  // IsNotNull and NUMERIC </> on its generated cells; anything else
  // (incl. string inequalities, which the reader can't evaluate) is left
  // for Spark to evaluate post-scan (returned un-pushed). Claiming a
  // filter you don't evaluate silently returns wrong rows.
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case _: EqualTo | _: IsNotNull => true
      case GreaterThan(_, v: Number) => true
      case LessThan(_, v: Number) => true
      case _ => false
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

  // ≙ LIMIT n (extract.py:32)
  override def pushLimit(l: Int): Boolean = { limit = l; true }

  // ≙ SELECT [g1,] COUNT()/MIN/MAX/SUM/AVG(...) [GROUP BY g1, g2] —
  // SOQL aggregate queries: the remote end returns per-group aggregate
  // rows per partition range instead of shipping every record over the
  // wire, the difference between a row-count-sized extract and a
  // group-count-sized one. Two modes, Spark picks via
  // [[supportCompletePushDown]]:
  //  - PARTIAL (the default, any partition count): each partition
  //    emits its partials (per group, post-filter) and Spark plans the
  //    final merge — the parallel fan-out is preserved and groups
  //    split across partitions re-merge. AVG is NOT accepted here:
  //    per-range AVG responses cannot be re-merged without the weights
  //    (Spark itself refuses Avg in partial mode and re-plans avg as
  //    sum+count, which this connector does accept — so partial-mode
  //    avg still pushes, as its two mergeable halves).
  //  - COMPLETE (single-partition scans only — `partitions=1`, the
  //    reference's own one-SOQL-call extract shape): one reader runs
  //    ONE aggregate SOQL over the whole object and its per-group rows
  //    ARE the final answer; Spark plans no merge at all. Here AVG is
  //    accepted directly (`AVG(field)`, which SOQL serves natively).
  // GROUP BY columns must be plain field references (multi-column
  // GROUP BY accepted — SOQL allows it); min/max/sum/avg only on
  // numeric (double) fields, where the generator's cell semantics
  // match SOQL's null-skipping aggregates. DISTINCT aggregates are
  // declined (not mergeable remotely, and SOQL COUNT_DISTINCT has no
  // per-range merge either).
  private def compileAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation,
      allowAvg: Boolean): Option[(Seq[PushedAgg], Seq[String])] = {
    import org.apache.spark.sql.connector.expressions.aggregate._
    import org.apache.spark.sql.connector.expressions.NamedReference
    def ref(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case nr: NamedReference => Some(nr.fieldNames.mkString("."))
        case _ => None
      }
    def numeric(n: String): Boolean =
      SalesforceSim.schemaFor(spec).fields
        .exists(f => f.name == n && f.dataType == DoubleType)
    val groups: Seq[Option[String]] = agg.groupByExpressions.toSeq.map(ref)
    if (groups.exists(_.isEmpty)) return None
    val compiled: Seq[Option[PushedAgg]] = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(PushedAgg("count_star", None))
      case c: Count if !c.isDistinct =>
        ref(c.column).map(n => PushedAgg("count", Some(n)))
      case m: Min =>
        ref(m.column).filter(numeric).map(n => PushedAgg("min", Some(n)))
      case m: Max =>
        ref(m.column).filter(numeric).map(n => PushedAgg("max", Some(n)))
      case s: Sum if !s.isDistinct =>
        ref(s.column).filter(numeric).map(n => PushedAgg("sum", Some(n)))
      case a: Avg if allowAvg && !a.isDistinct =>
        ref(a.column).filter(numeric).map(n => PushedAgg("avg", Some(n)))
      case _ => None
    }
    if (compiled.isEmpty || compiled.exists(_.isEmpty)) None
    else Some((compiled.flatten, groups.flatten))
  }

  /** Complete pushdown — scan output is final, no Spark-side merge —
    * is sound ONLY when one reader sees the whole object: a
    * single-partition scan. That is exactly the reference's extract
    * shape (one SOQL call, `extract.py:66-101`). */
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    partitions == 1 && compileAggregation(agg, allowAvg = true).isDefined

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    compileAggregation(agg, allowAvg = partitions == 1) match {
      case Some((aggs, groups)) =>
        pushedAggs = Some(aggs)
        pushedGroupBy = groups
        true
      case None => false
    }

  override def build(): Scan = pushedAggs match {
    case Some(aggs) =>
      new SimAggScan(spec, rows, partitions, aggs, pushedGroupBy, pushed, backend)
    case None =>
      new SimScan(spec, rows, partitions, requiredSchema, pushed, limit, backend)
  }
}

class SimScan(
    spec: ObjectSpec, rows: Long, partitions: Int,
    override val readSchema: StructType,
    filters: Array[Filter], limit: Long,
    backend: SalesforceBackend)
  extends Scan with Batch {

  override def toBatch: Batch = this

  // surfaces the pushdowns in explain() the way file scans do
  override def description(): String =
    s"SalesforceSim(${spec.apiName}) PushedFilters: [${filters.mkString(", ")}], " +
      s"PushedLimit: ${if (limit >= 0) limit else "none"}, " +
      s"ReadSchema: ${readSchema.catalogString}"

  override def planInputPartitions(): Array[InputPartition] = {
    // the scan RANGE may be capped to the limit only when no filter is
    // pushed — with filters, `limit` bounds EMITTED rows, so the reader
    // must keep scanning the full range until it finds enough matches
    val capRange = limit >= 0 && filters.isEmpty
    val effective = if (capRange) math.min(rows, limit) else rows
    // a pushed limit still collapses the fan-out: one reader emits at
    // most `limit` rows; parallel partitions would overfetch
    SimPushdown.ranges(effective, if (limit >= 0) 1 else partitions)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SimReaderFactory(spec.apiName, readSchema,
      SalesforceSim.schemaFor(spec), filters, limit, backend)
}

case class SimPartition(start: Long, end: Long) extends InputPartition

/** THE single spelling of the pushed-filter evaluation and the range
  * chunking, shared by the row reader and the aggregate reader — the
  * residual-filter contract ("claiming a filter you don't evaluate
  * silently returns wrong rows/aggregates") must not live in two
  * divergeable copies. */
private[v2] object SimPushdown {
  def matches(filters: Array[Filter], fetchIndex: Map[String, Int],
      row: Array[Any]): Boolean = filters.forall {
    case EqualTo(attr, value) =>
      val c = row(fetchIndex(attr)); c != null && c.toString == value.toString
    case IsNotNull(attr) => row(fetchIndex(attr)) != null
    case GreaterThan(attr, value: Number) =>
      val c = row(fetchIndex(attr))
      c != null && c.asInstanceOf[Double] > value.doubleValue()
    case LessThan(attr, value: Number) =>
      val c = row(fetchIndex(attr))
      c != null && c.asInstanceOf[Double] < value.doubleValue()
    case _ => true
  }

  def ranges(total: Long, parts: Int): Array[InputPartition] = {
    val per = math.max(1L, (total + parts - 1) / parts)
    (0 until parts).map { p =>
      SimPartition(p * per, math.min(total, (p + 1) * per))
    }.filter(p => p.start < p.end).toArray[InputPartition]
  }
}

class SimReaderFactory(
    objectName: String, schema: StructType, fullSchema: StructType,
    filters: Array[Filter], limit: Long, backend: SalesforceBackend)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SimPartition]
    new SimReader(objectName, schema, fullSchema, filters, p.start, p.end,
      if (limit >= 0) limit else Long.MaxValue, backend)
  }
}

class SimReader(
    objectName: String, schema: StructType, fullSchema: StructType,
    filters: Array[Filter], start: Long, end: Long, limit: Long,
    backend: SalesforceBackend)
  extends PartitionReader[InternalRow] {

  // The backend fetches only the fields this scan needs: the pruned
  // projection plus any column a pushed filter references (a filter may
  // reference a column pruned out of the projection; evaluating it with
  // a fallback type would compare the wrong value).
  private val filterCols = filters.flatMap(_.references).distinct.toSet
  private val fetchSchema = StructType(fullSchema.fields.filter(f =>
    schema.fieldNames.contains(f.name) || filterCols.contains(f.name)))
  private val fetchIndex = fetchSchema.fieldNames.zipWithIndex.toMap
  private val projIdx = schema.fieldNames.map(fetchIndex)

  // The SOQL SELECT list is the FETCH schema (projection + filter
  // columns), not the bare projection: a live backend returns rows in
  // query-field order, and matches() must find the filter columns in
  // them. (SELECT-ing a WHERE column the caller didn't project is what
  // the reference's hand-built SOQL does implicitly too.)
  private val soql = CompiledSoql(objectName, fetchSchema.fieldNames.toSeq,
    filters.toSeq, if (limit == Long.MaxValue) None else Some(limit))
  private val rows = backend.fetch(soql, start, end, fetchSchema)

  private var emitted = 0L
  private var current: InternalRow = _

  private def matches(row: Array[Any]): Boolean =
    SimPushdown.matches(filters, fetchIndex, row)

  override def next(): Boolean = {
    while (emitted < limit && rows.hasNext) {
      val r = rows.next()
      if (matches(r)) {
        current = new GenericInternalRow(projIdx.map(r(_)).toArray[Any])
        emitted += 1
        return true
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}

/** Aggregate-pushdown scan: each partition's reader runs the aggregate
  * SOQL over its range and emits one partial row PER GROUP (one total,
  * ungrouped); Spark merges the partials — the wire carries
  * partitions×groups rows instead of the table. */
class SimAggScan(
    spec: ObjectSpec, rows: Long, partitions: Int,
    aggs: Seq[PushedAgg], groupBy: Seq[String], filters: Array[Filter],
    backend: SalesforceBackend)
  extends Scan with Batch {

  override def toBatch: Batch = this

  // group columns FIRST (their source types), then the aggregates —
  // the layout Spark's partial-pushdown rewrite expects
  override val readSchema: StructType = StructType(
    groupBy.map(g => SalesforceSim.schemaFor(spec)(g)) ++
      aggs.map { a =>
        a.fn match {
          case "count_star" | "count" =>
            StructField(a.soql, LongType, nullable = false)
          case _ => StructField(a.soql, DoubleType, nullable = true)
        }
      })

  override def description(): String =
    s"SalesforceSim(${spec.apiName}) PushedAggregates: " +
      s"[${aggs.map(_.soql).mkString(", ")}], " +
      s"PushedGroupBy: [${groupBy.mkString(", ")}], " +
      s"PushedFilters: [${filters.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] =
    SimPushdown.ranges(rows, partitions)

  override def createReaderFactory(): PartitionReaderFactory =
    new SimAggReaderFactory(spec, aggs, groupBy, filters, backend)
}

class SimAggReaderFactory(
    spec: ObjectSpec, aggs: Seq[PushedAgg], groupBy: Seq[String],
    filters: Array[Filter],
    backend: SalesforceBackend) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SimPartition]
    new SimAggReader(spec, aggs, groupBy, filters, p.start, p.end, backend)
  }
}

/** Computes the partial aggregate rows for its range — one per group
  * (one total, ungrouped): what the live wire's aggregate SOQL
  * response IS; the zero-egress sim folds the generated rows locally
  * with the same null-skipping semantics SOQL (and Spark's merge) use:
  * COUNT() counts rows, COUNT(f)/MIN/MAX/SUM skip nulls, empty group →
  * never emitted, empty UNGROUPED input → count 0 / min-max-sum null
  * (the SQL global-aggregate rule). */
class SimAggReader(
    spec: ObjectSpec, aggs: Seq[PushedAgg], groupBy: Seq[String],
    filters: Array[Filter],
    start: Long, end: Long, backend: SalesforceBackend)
  extends PartitionReader[InternalRow] {

  private val fullSchema = SalesforceSim.schemaFor(spec)
  private val filterCols = filters.flatMap(_.references).distinct.toSet
  private val neededCols =
    (groupBy ++ aggs.flatMap(_.col) ++ filterCols).distinct
  private val fetchSchema = {
    val needed = fullSchema.fields.filter(f => neededCols.contains(f.name))
    // a bare global COUNT() needs no column, but a well-formed SOQL
    // needs a non-empty SELECT list — floor at one field (COUNT()
    // counts rows regardless of which)
    StructType(if (needed.nonEmpty) needed else fullSchema.fields.take(1))
  }
  private val fetchIndex = fetchSchema.fieldNames.zipWithIndex.toMap
  private val groupIdx = groupBy.map(fetchIndex)

  // the aggregate SOQL the live backend would run for this range — the
  // select list IS the group keys + pushed aggregates, not the fields
  private val soql = CompiledSoql(spec.apiName,
    groupBy ++ aggs.map(_.soql), filters.toSeq, None, groupBy)

  private final class Acc {
    val counts = new Array[Long](aggs.length)
    val doubles = new Array[Double](aggs.length)
    val seen = new Array[Boolean](aggs.length)
  }

  private var out: Iterator[InternalRow] = _
  private var current: InternalRow = _

  private def matches(row: Array[Any]): Boolean =
    SimPushdown.matches(filters, fetchIndex, row)

  private def fold(): Iterator[InternalRow] = {
    // fetch only the group/agg/filter columns (the sim generates them;
    // a live backend would instead return `soql`'s aggregate rows)
    val rows = backend.fetch(
      CompiledSoql(spec.apiName, fetchSchema.fieldNames.toSeq,
        filters.toSeq, None),
      start, end, fetchSchema)
    val groupsAcc =
      new scala.collection.mutable.LinkedHashMap[List[Any], Acc]()
    // ungrouped: the single global accumulator exists even on empty input
    if (groupBy.isEmpty) groupsAcc(Nil) = new Acc
    while (rows.hasNext) {
      val r = rows.next()
      if (matches(r)) {
        val key = groupIdx.map(r(_)).toList
        val acc = groupsAcc.getOrElseUpdate(key, new Acc)
        var i = 0
        while (i < aggs.length) {
          val a = aggs(i)
          a.fn match {
            case "count_star" => acc.counts(i) += 1
            case "count" =>
              if (r(fetchIndex(a.col.get)) != null) acc.counts(i) += 1
            case _ =>
              val v = r(fetchIndex(a.col.get))
              if (v != null) {
                val d = v.asInstanceOf[Double]
                if (!acc.seen(i)) {
                  acc.doubles(i) = d; acc.seen(i) = true
                  if (a.fn == "avg") acc.counts(i) = 1
                }
                else a.fn match {
                  case "min" => if (d < acc.doubles(i)) acc.doubles(i) = d
                  case "max" => if (d > acc.doubles(i)) acc.doubles(i) = d
                  case "sum" => acc.doubles(i) += d
                  case "avg" => acc.doubles(i) += d; acc.counts(i) += 1
                }
              }
          }
          i += 1
        }
      }
    }
    groupsAcc.iterator.map { case (key, acc) =>
      val aggVals = aggs.zipWithIndex.map { case (a, i) =>
        a.fn match {
          case "count_star" | "count" => java.lang.Long.valueOf(acc.counts(i))
          case "avg" =>
            // SOQL AVG skips nulls; all-null → null (SQL semantics)
            if (acc.seen(i))
              java.lang.Double.valueOf(acc.doubles(i) / acc.counts(i))
            else null
          case _ =>
            if (acc.seen(i)) java.lang.Double.valueOf(acc.doubles(i)) else null
        }
      }
      new GenericInternalRow((key ++ aggVals).toArray[Any]): InternalRow
    }
  }

  override def next(): Boolean = {
    if (out == null) out = fold()
    if (out.hasNext) { current = out.next(); true } else false
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()

  /** The wire-shape evidence for specs: the aggregate SOQL this range
    * compiles to. */
  def aggregateSoql: String = soql.toSoql
}
