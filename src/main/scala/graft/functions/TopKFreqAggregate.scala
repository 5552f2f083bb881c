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

  // Space-Saving's minimum count never decreases, so a cached lower
  // bound lets most evictions stop at the first entry at/below it
  // (amortized far below the naive O(capacity) minBy-per-insert; a full
  // rescan runs only when the bound is stale). The bound is valid only
  // for the buffer it was computed on — one expression instance serves
  // MANY buffers in grouped aggregation, and carrying a heavy group's
  // high bound into a light group would evict a wrong (non-minimum)
  // victim and inflate the newcomer to its count, breaking the
  // Space-Saving error bound. Track the owning buffer by identity and
  // reset on switch: consecutive adds to one group (the hot loop) keep
  // the amortization, cross-group correctness is preserved.
  @transient private var minBound: Long = 0L
  @transient private var boundOwner: AnyRef = null

  private def add(buf: mutable.HashMap[String, Long], key: String, n: Long): Unit = {
    buf.get(key) match {
      case Some(c) => buf.update(key, c + n)
      case None if buf.size < capacity => buf.update(key, n)
      case None =>
        if (boundOwner ne buf) { minBound = 0L; boundOwner = buf }
        // Space-Saving eviction: replace a current-minimum entry
        var minK: String = null
        var minV = Long.MaxValue
        val it = buf.iterator
        while (it.hasNext && minV > minBound) {
          val (k0, v0) = it.next()
          if (v0 < minV) { minK = k0; minV = v0 }
        }
        minBound = minV
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
    // drop the bound-owner reference: keeping the last evicting buffer
    // (up to `capacity` strings) reachable past its lifetime pins memory
    // for no benefit — the cached bound only matters on identity match
    if (boundOwner eq buf) { boundOwner = null; minBound = 0L }
    val top = buf.toSeq
      .sortBy { case (v, c) => (-c, v) }
      .take(k)
      .map { case (v, c) => InternalRow(UTF8String.fromString(v), c) }
    new GenericArrayData(top.toArray[Any])
  }

  // length-prefixed UTF-8, NOT writeUTF — writeUTF caps strings at
  // 65535 bytes and would crash on long-document values
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    if (boundOwner eq buf) { boundOwner = null; minBound = 0L } // see eval
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (v, c) =>
      val bytes = v.getBytes("UTF-8")
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val strBytes = new Array[Byte](len)
      in.readFully(strBytes)
      buf.update(new String(strBytes, "UTF-8"), in.readLong())
      i += 1
    }
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
