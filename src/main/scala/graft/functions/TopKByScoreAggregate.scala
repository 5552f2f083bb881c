package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** `top_k_by_score(id, score, k)` — the top k (id, score) entries by
  * (score DESC, id ASC) in ONE aggregation pass, as a custom
  * `TypedImperativeAggregate`.
  *
  * This is the scale-safe replacement for the
  * `row_number().over(Window.partitionBy(queryId).orderBy(score.desc))`
  * ranking idiom: the window shuffles EVERY scored candidate row into a
  * single partition per query (with few queries, the whole scored corpus
  * lands on that many tasks — a straggler/OOM factory at 100 TB), while
  * this aggregate keeps a bounded k-entry heap per group per input
  * partition, merges heaps in the partial/final combine, and ships only
  * `k × groups × partitions` entries through the exchange. Map-side
  * partial aggregation does the heavy lifting where the data already is.
  *
  * Ordering is total — (score desc, id asc) with a deterministic id
  * tie-break — so the result is independent of partitioning and row
  * order, exactly like the window spelling it replaces. Null scores/ids
  * are skipped (a null cosine can only arise from a null vector, which
  * cannot be a meaningful neighbor).
  *
  * Output: `array<struct<id, score>>` ordered best-first; pair with
  * `posexplode` to recover (id, score, rank).
  */
case class TopKByScore(
    id: Expression,
    score: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Any)]] {
  require(k >= 1 && k <= (1 << 20), s"k=$k out of range")

  override def children: Seq[Expression] = Seq(id, score)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", id.dataType), StructField("score", DoubleType))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (score.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"top_k_by_score expects a double score, got ${score.dataType}")
    else if (!org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(id.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"top_k_by_score id type ${id.dataType} is not orderable")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val idOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(id.dataType)

  /** Scala's PriorityQueue dequeues the MAXIMUM of its ordering; we need
    * the WORST entry on top (to evict), so "greater" = worse: lower
    * score, or same score and larger id. */
  @transient private lazy val worstFirst: Ordering[(Double, Any)] =
    new Ordering[(Double, Any)] {
      override def compare(a: (Double, Any), b: (Double, Any)): Int = {
        val s = java.lang.Double.compare(b._1, a._1) // lower score = "greater"
        if (s != 0) s else idOrdering.compare(a._2, b._2) // larger id = "greater"
      }
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Any)] =
    mutable.PriorityQueue.empty(worstFirst)

  private def add(buf: mutable.PriorityQueue[(Double, Any)], entry: (Double, Any)): Unit =
    if (buf.size < k) buf.enqueue(entry)
    else if (worstFirst.compare(entry, buf.head) < 0) { // strictly better than the worst
      buf.dequeue(); buf.enqueue(entry)
    }

  override def update(
      buf: mutable.PriorityQueue[(Double, Any)],
      input: InternalRow): mutable.PriorityQueue[(Double, Any)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    // copy: UTF8String/array ids may point into a reused row buffer
    if (s != null && i != null)
      add(buf, (s.asInstanceOf[Double], InternalRow.copyValue(i)))
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Double, Any)],
      other: mutable.PriorityQueue[(Double, Any)]): mutable.PriorityQueue[(Double, Any)] = {
    other.foreach(add(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Any)]): Any = {
    // NON-mutating: eval must leave the buffer intact — as a window
    // function a running frame calls eval repeatedly on the same live
    // buffer, and draining it would forget every earlier entry. Drain a
    // clone (worst-first) and reverse for best-first output.
    val drained = buf.clone().dequeueAll
    val n = drained.length
    val rows = new Array[Any](n)
    var i = 0
    while (i < n) {
      val (s, ident) = drained(n - 1 - i)
      rows(i) = InternalRow(ident, s)
      i += 1
    }
    new GenericArrayData(rows)
  }

  // (score, id) rows serialized as length-prefixed UnsafeRows — generic
  // over the id type without a hand-rolled encoding per type
  @transient private lazy val rowProjection: UnsafeProjection =
    UnsafeProjection.create(Array[DataType](DoubleType, id.dataType))

  override def serialize(buf: mutable.PriorityQueue[(Double, Any)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, ident) =>
      val row = rowProjection(InternalRow(s, ident))
      out.writeInt(row.getSizeInBytes)
      row.writeToStream(out, null)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Any)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val rowBytes = new Array[Byte](len)
      in.readFully(rowBytes)
      val row = new UnsafeRow(2)
      row.pointTo(rowBytes, len)
      // copy non-primitive ids out of the row buffer we'd otherwise alias
      buf.enqueue((row.getDouble(0), InternalRow.copyValue(row.get(1, id.dataType))))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKByScore =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKByScore =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(id = c(0), score = c(1))
  override def prettyName: String = "top_k_by_score"
}
