package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_hit_count(shingles)` — how many elements of a string array a
  * Bloom filter MIGHT contain, as one codegen'd projection.
  *
  * This is the corpus-side probe of Bloom-prefiltered decontamination
  * ([[graft.operators.Decontaminate]]): the eval set's shingle
  * membership is compressed into a ~10-bits-per-shingle filter that
  * ships as a task-binary constant (the [[NearestCentroids]] "data, not
  * code" pattern), so the contamination pre-check is a pure map over the
  * corpus — ZERO shuffles, zero joins, no eval-string broadcast — and
  * the only rows that go on to the exact verify join are docs the filter
  * could not rule out.
  *
  * One-sided error is the load-bearing contract: a Bloom filter has NO
  * false negatives, so for any row `hit_count >= |true ∩ eval shingles|`
  * — a threshold on it can only over-admit (false positives, removed by
  * the exact verify), never drop a genuinely contaminated doc.
  *
  * Probe hashing matches the build side byte-for-byte:
  * `DataFrameStatFunctions.bloomFilter` puts strings via their UTF-8
  * bytes, and this probe hashes `UTF8String.getBytes` through
  * `mightContainBinary` — same bytes, same Murmur3 path. Null array →
  * null; null elements are skipped (they carry no shingle).
  */
case class BloomHitCount(child: Expression, kernel: BloomHitCount.Kernel)
    extends UnaryExpression {

  override def prettyName: String = "bloom_hit_count"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_hit_count expects array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Integer.valueOf(kernel.compute(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the filter is data, not code: ship the serialized bits as a
    // reference object; the generated Java stays one method call
    val kernelRef = ctx.addReferenceObj("bloomHitCountKernel", kernel,
      classOf[BloomHitCount.Kernel].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernelRef.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BloomHitCount {
  /** Serialized-bits carrier + probe loop. Holds the filter as its wire
    * bytes (compact, java-serializable for the plan/codegen reference)
    * and inflates once per task on first probe. */
  final class Kernel(val filterBytes: Array[Byte]) extends Serializable {
    @transient private lazy val bloom: BloomFilter =
      BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

    def compute(arr: ArrayData): Int = {
      val n = arr.numElements()
      var hits = 0
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i) &&
            bloom.mightContainBinary(arr.getUTF8String(i).getBytes)) {
          hits += 1
        }
        i += 1
      }
      hits
    }

    /** Scalar probe (spec/diagnostic surface for the same bits). */
    def mightContain(s: String): Boolean =
      bloom.mightContainBinary(
        s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }
}
