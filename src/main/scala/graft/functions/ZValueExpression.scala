package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types._

/** `z_interleave(rank0, rank1, …)` — the Morton/Z-order curve key: bit
  * b of rank i lands at result bit `b·k + i`, so the k rank columns'
  * bits alternate and sorting by the result clusters rows that are
  * close in EVERY dimension at once.
  *
  * This is the key-construction half of [[graft.operators.Layout]]'s
  * multi-dimensional clustered write (the Delta/Hudi OPTIMIZE ZORDER
  * idea, built from public construction: Morton, "A computer oriented
  * geodetic data base", 1966): parquet min/max row-group stats prune on
  * ANY of the z-ordered dimensions, where a plain sort only prunes its
  * leading column.
  *
  * Inputs are already-bucketed ranks in `[0, 2^bits)` (the operator
  * builds them — range buckets for numerics/timestamps, hash buckets
  * for strings); this expression only interleaves, one codegen'd loop
  * per row, `k·bits ≤ 63` enforced at construction. Any null rank →
  * null key (the operator coalesces ranks first, so a null here means
  * a caller bug, not data).
  */
case class ZValueInterleave(children: Seq[Expression], bits: Int)
    extends Expression {
  require(children.nonEmpty, "z_interleave needs at least one rank column")
  require(bits >= 1 && children.size * bits <= 63,
    s"k=${children.size} ranks × bits=$bits must fit a positive long (≤ 63 bits)")

  override def prettyName: String = "z_interleave"
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    children.find(_.dataType != LongType) match {
      case Some(c) => TypeCheckResult.TypeCheckFailure(
        s"z_interleave expects bigint ranks, got ${c.dataType}")
      case None => TypeCheckResult.TypeCheckSuccess
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val k = children.size
    var result = 0L
    var i = 0
    while (i < k) {
      val v = children(i).eval(input)
      if (v == null) return null
      val r = v.asInstanceOf[Long]
      var b = 0
      while (b < bits) {
        result |= ((r >>> b) & 1L) << (b * k + i)
        b += 1
      }
      i += 1
    }
    java.lang.Long.valueOf(result)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = children.size
    val evals = children.map(_.genCode(ctx))
    val anyNull =
      if (nullable) evals.map(e => s"${e.isNull}").mkString(" || ") else "false"
    val interleave = evals.zipWithIndex.map { case (e, i) =>
      s"""for (int b = 0; b < $bits; b++) {
         |  ${ev.value} |= ((${e.value} >>> b) & 1L) << (b * $k + $i);
         |}""".stripMargin
    }.mkString("\n")
    ev.copy(code = code"""
      ${evals.map(_.code).mkString("\n")}
      boolean ${ev.isNull} = $anyNull;
      long ${ev.value} = 0L;
      if (!${ev.isNull}) {
        $interleave
      }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
