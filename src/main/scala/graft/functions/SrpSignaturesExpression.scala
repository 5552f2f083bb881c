package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `srp_signatures(vec)` — ALL `tables` sign-random-projection bucket
  * ids of a vector in one native pass: `out(t) = Σ_i [dot(vec,
  * plane(t·bits+i)) ≥ 0] · 2^i`.
  *
  * Semantically ≡ the nested HOF spelling
  * (`transform(sequence(tables), t -> aggregate(sequence(bits), ...))`
  * over a plane literal) that [[graft.operators.TextDedup
  * .srpBucketRows]] used: same [[DotProduct]] fold order (sequential,
  * min-length, null elements contribute 0), same `≥ 0` sign rule (an
  * all-null/empty/short vector dots to 0.0 → bit SET; a NaN dot → bit
  * SET too — Spark SQL orders NaN above every double, unlike Java's
  * primitive `>=`), same int bucket arithmetic, and a NULL vector
  * yields the
  * all-zero bucket row per table (the `when(null ≥ 0).otherwise(0)`
  * fold result), so downstream explode emits the same rows.
  * TextDedupSpec asserts the equality.
  *
  * Exists because HOF lambdas are interpreted per element: the
  * tables×bits dot products walked an expression tree per bit
  * (measured: the 2 000-vector sf0.1 bucketing stage spent seconds in
  * the interpreter for ~50 ms of multiply-adds). The plane matrix
  * rides as a task-binary reference object, not a literal — keeping
  * the generated Java small (the Janino lesson) AND the analyzed plan
  * free of a tables×bits×dim constant subtree. */
case class SrpSignatures(
    child: Expression,
    planes: Array[Array[Double]],
    bits: Int,
    tables: Int) extends UnaryExpression {
  require(bits >= 1 && bits <= 30, s"bits=$bits out of range")
  require(tables >= 1, s"tables=$tables must be >= 1")
  require(planes.length == tables * bits,
    s"plane count ${planes.length} != tables×bits = ${tables * bits}")

  override def prettyName: String = "srp_signatures"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  // a null vector maps to the all-zero bucket per table (the HOF
  // spelling's when(null).otherwise(0) fold), never to a null array
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"srp_signatures expects array<float|double>, got $other")
  }

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  @transient lazy val kernel: SrpSignatures.Kernel =
    new SrpSignatures.Kernel(planes, bits, tables, elemIsFloat)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    kernel.compute(if (v == null) null else v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val kernelRef = ctx.addReferenceObj("srpSignaturesKernel", kernel,
      classOf[SrpSignatures.Kernel].getName)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(
      code = code"""
        |${childGen.code}
        |$javaType ${ev.value} = $kernelRef.compute(
        |  ${childGen.isNull} ? null : ${childGen.value});
      """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object SrpSignatures {
  /** The plane matrix + sign fold, materialized once per task; static
    * entry so the generated Java calls straight in. */
  final class Kernel(planes: Array[Array[Double]], bits: Int, tables: Int,
      elemIsFloat: Boolean) extends Serializable {
    def compute(vec: ArrayData): ArrayData = {
      val out = new Array[Any](tables)
      if (vec == null) {
        var t = 0
        while (t < tables) { out(t) = Integer.valueOf(0); t += 1 }
        return new GenericArrayData(out)
      }
      val vLen = vec.numElements()
      var t = 0
      while (t < tables) {
        var bkt = 0
        var i = 0
        while (i < bits) {
          val plane = planes(t * bits + i)
          val n = math.min(vLen, plane.length)
          var acc = 0.0
          var j = 0
          while (j < n) {
            if (!vec.isNullAt(j))
              acc += (if (elemIsFloat) vec.getFloat(j).toDouble
                      else vec.getDouble(j)) * plane(j)
            j += 1
          }
          // Spark SQL's GreaterThanOrEqual orders NaN ABOVE every
          // double (so the HOF spelling sets the bit for a NaN dot);
          // Java's primitive >= says false — match Spark
          if (acc >= 0 || java.lang.Double.isNaN(acc)) bkt += (1 << i)
          i += 1
        }
        out(t) = Integer.valueOf(bkt)
        t += 1
      }
      new GenericArrayData(out)
    }
  }
}
