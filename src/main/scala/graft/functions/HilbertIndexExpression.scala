package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types._

/** `hilbert_index(rank0, rank1, …)` — the Hilbert-curve key over
  * already-bucketed ranks in `[0, 2^bits)`: same inputs and output
  * domain as [[ZValueInterleave]], better locality. The Morton curve
  * takes a long diagonal jump every time a high bit flips (the
  * worst-case neighbors land `2^(k·bits-1)` apart on the key line); the
  * Hilbert curve's consecutive keys are always UNIT steps in exactly
  * one dimension, so file boundaries cut the space into tighter
  * hyper-rectangles — the reason table formats grew a Hilbert option
  * next to Z-order.
  *
  * Construction is Skilling's public-domain transform ("Programming the
  * Hilbert curve", AIP Conf. Proc. 707, 2004): undo the per-level
  * rotations/reflections in place, Gray-encode across dimensions, then
  * read the index off as the MSB-first transpose interleave. One
  * codegen'd kernel call per row, `k·bits ≤ 63`. Null rank → null key
  * (the operator coalesces ranks first). */
case class HilbertIndex(children: Seq[Expression], bits: Int)
    extends Expression {
  require(children.nonEmpty, "hilbert_index needs at least one rank column")
  require(bits >= 1 && children.size * bits <= 63,
    s"k=${children.size} ranks × bits=$bits must fit a positive long (≤ 63 bits)")

  override def prettyName: String = "hilbert_index"
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    children.find(_.dataType != LongType) match {
      case Some(c) => TypeCheckResult.TypeCheckFailure(
        s"hilbert_index expects bigint ranks, got ${c.dataType}")
      case None => TypeCheckResult.TypeCheckSuccess
    }

  @transient lazy val kernel = new HilbertIndex.Kernel(children.size, bits)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val ranks = new Array[Long](children.size)
    var i = 0
    while (i < children.size) {
      val v = children(i).eval(input)
      if (v == null) return null
      ranks(i) = v.asInstanceOf[Long]
      i += 1
    }
    java.lang.Long.valueOf(kernel.compute(ranks))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = children.size
    val evals = children.map(_.genCode(ctx))
    val kernelRef = ctx.addReferenceObj("hilbertKernel", kernel,
      classOf[HilbertIndex.Kernel].getName)
    val arr = ctx.freshName("hilbertRanks")
    val anyNull =
      if (nullable) evals.map(e => s"${e.isNull}").mkString(" || ") else "false"
    val fill = evals.zipWithIndex.map { case (e, i) =>
      s"$arr[$i] = ${e.value};"
    }.mkString("\n")
    ev.copy(code = code"""
      ${evals.map(_.code).mkString("\n")}
      boolean ${ev.isNull} = $anyNull;
      long ${ev.value} = 0L;
      if (!${ev.isNull}) {
        long[] $arr = new long[$k];
        $fill
        ${ev.value} = $kernelRef.compute($arr);
      }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object HilbertIndex {
  /** Skilling's axes→transpose transform + the MSB-first interleave.
    * Mutates its input array (freshly built per row by the caller). */
  final class Kernel(k: Int, bits: Int) extends Serializable {
    def compute(x: Array[Long]): Long = {
      // inverse-undo the rotations/reflections, top level down
      var q = 1L << (bits - 1)
      while (q > 1) {
        val p = q - 1
        var i = 0
        while (i < k) {
          if ((x(i) & q) != 0L) x(0) ^= p // invert low bits of dim 0
          else { // exchange low bits of dim 0 and dim i
            val t = (x(0) ^ x(i)) & p
            x(0) ^= t; x(i) ^= t
          }
          i += 1
        }
        q >>= 1
      }
      // Gray encode across dimensions
      var i = 1
      while (i < k) { x(i) ^= x(i - 1); i += 1 }
      var t = 0L
      q = 1L << (bits - 1)
      while (q > 1) {
        if ((x(k - 1) & q) != 0L) t ^= q - 1
        q >>= 1
      }
      i = 0
      while (i < k) { x(i) ^= t; i += 1 }
      // transpose interleave: dim 0's bit is most significant per level
      var h = 0L
      var b = bits - 1
      while (b >= 0) {
        var d = 0
        while (d < k) {
          h = (h << 1) | ((x(d) >>> b) & 1L)
          d += 1
        }
        b -= 1
      }
      h
    }
  }
}
