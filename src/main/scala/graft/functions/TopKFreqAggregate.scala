package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `top_k_freq(col, k)` — top-k most frequent values of a string column
  * in ONE aggregation pass, as a custom `TypedImperativeAggregate`.
  *
  * This is the §7.3 upgrade for the column profiler: the composed form
  * needs a count-per-value shuffle plus a window per column; this
  * aggregate keeps a bounded frequency map as its buffer, merges maps in
  * the partial/final combine, and emits the top-k directly — so an
  * entire multi-column profile becomes a single `df.agg(...)` job with
  * map-side partial aggregation and O(capacity) state per column.
  *
  * Bounded-memory policy: while distinct values ≤ `capacity` counts are
  * EXACT. On overflow the minimum-count entry is evicted and the
  * newcomer inherits minCount+1 — the Space-Saving sketch (Metwally,
  * Agrawal, El Abbadi, "Efficient computation of frequent and top-k
  * elements in data streams", ICDT 2005): top-k remains approximately
  * correct with bounded error ≤ minCount. The default capacity (8192)
  * makes it exact for the profiler's cardinality-capped use (cap 5000,
  * `tasks/quality_parallel.py:125`).
  *
  * Output: array<struct<value:string, cnt:long>> ordered by
  * (cnt desc, value asc) — the profiler's deterministic tie-break.
  */
case class TopKFreq(
    child: Expression,
    k: Int,
    capacity: Int = TopKFreq.DefaultCapacity,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = TopKFreq.ResultType

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  private def add(buf: mutable.HashMap[String, Long], key: String, n: Long): Unit = {
    buf.get(key) match {
      case Some(c) => buf.update(key, c + n)
      case None if buf.size < capacity => buf.update(key, n)
      case None =>
        // Space-Saving eviction: replace the current minimum
        val (minK, minV) = buf.minBy(_._2)
        buf.remove(minK)
        buf.update(key, minV + n)
    }
  }

  override def update(
      buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.toString, 1L)
    buf
  }

  override def merge(
      buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (key, n) => add(buf, key, n) }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val top = buf.toSeq
      .sortBy { case (v, c) => (-c, v) }
      .take(k)
      .map { case (v, c) => InternalRow(UTF8String.fromString(v), c) }
    new GenericArrayData(top.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (v, c) => out.writeUTF(v); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) { buf.update(in.readUTF(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKFreq =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKFreq =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
  override def prettyName: String = "top_k_freq"
}

object TopKFreq {
  val DefaultCapacity = 8192
  val ResultType: DataType = ArrayType(StructType(Seq(
    StructField("value", StringType), StructField("cnt", LongType))))
}
