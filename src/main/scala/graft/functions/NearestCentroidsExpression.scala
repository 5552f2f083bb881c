package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `nearest_centroids(vec, centroids, nProbe)` — the `nProbe` centroid
  * ids nearest to `vec` by cosine (ties → lower id), as ONE codegen'd
  * projection.
  *
  * This is the IVF assignment step done right for scale: the centroid set
  * is aggregate-sized and driver-known, so shipping it inside the
  * expression (a task-binary constant, like the SRP plane literals in
  * `TextDedup.embeddingNearDupPairsLsh`) turns assignment into a pure
  * map — ZERO shuffles, zero joins — where the previous spelling
  * (`crossJoin(centroids)` + `row_number` window partitioned by row id)
  * amplified the corpus nCentroids× and then shuffled ALL of it just to
  * take each row's argmax.
  *
  * Cosine matches [[CosineSimilarity]] op-for-op (same fold order, same
  * zero-norm → 0.0 rule), so assignment is bit-identical to scoring the
  * centroid relation with `cosine_similarity` — the invariant the
  * exhaustive-probe oracle (q_ann_ivf_topk) relies on.
  *
  * Null/empty semantics: null vec → null; nProbe ≥ nCentroids returns
  * all ids ranked.
  */
case class NearestCentroids(
    child: Expression,
    centroidIds: Seq[Long],
    centroidVecs: Seq[Seq[Double]],
    nProbe: Int) extends UnaryExpression {
  require(centroidIds.nonEmpty && centroidIds.length == centroidVecs.length,
    s"ids (${centroidIds.length}) and vectors (${centroidVecs.length}) must align, non-empty")
  require(nProbe >= 1, s"nProbe=$nProbe out of range")

  override def prettyName: String = "nearest_centroids"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroids expects array<float|double>, got $other")
  }

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // flat centroid matrix, materialized once per task
  @transient lazy val kernel: NearestCentroids.Kernel = {
    val dim = centroidVecs.head.length
    require(centroidVecs.forall(_.length == dim),
      s"ragged centroid matrix: expected uniform dim $dim")
    val flat = new Array[Double](centroidVecs.length * dim)
    var c = 0
    while (c < centroidVecs.length) {
      val v = centroidVecs(c)
      var i = 0
      while (i < dim) {
        flat(c * dim + i) = v(i)
        i += 1
      }
      c += 1
    }
    new NearestCentroids.Kernel(
      centroidIds.toArray, flat, dim, nProbe, elemIsFloat)
  }

  override def nullSafeEval(v: Any): Any = kernel.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // matrix is data, not code: ship it as a reference object the
    // generated Java indexes (keeps the generated source small — the
    // Janino lesson from the SRP plane literals)
    val kernelRef = ctx.addReferenceObj("nearestCentroidsKernel", kernel,
      classOf[NearestCentroids.Kernel].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $kernelRef.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object NearestCentroids {
  /** Precomputed centroid matrix + the ranking loop, serializable so the
    * codegen reference object ships in the task binary. */
  final class Kernel(
      val ids: Array[Long],
      val flat: Array[Double],
      val dim: Int,
      val nProbe: Int,
      val childIsFloat: Boolean) extends Serializable {

    def compute(vec: ArrayData): ArrayData = {
      val nC = ids.length
      val n = math.min(vec.numElements(), dim)
      val sims = new Array[Double](nC)
      var c = 0
      while (c < nC) {
        // the EXACT per-pair fold CosineSimilarity runs — dot/na/nb
        // accumulated together over i < min(len), skipping null input
        // elements — so short or null-holed vectors still assign
        // identically to scoring the centroid relation (the invariant
        // the q_ann_ivf_topk oracle relies on); a precomputed centroid
        // norm would diverge exactly there
        var dot = 0.0
        var na = 0.0
        var nb = 0.0
        val base = c * dim
        var i = 0
        while (i < n) {
          if (!vec.isNullAt(i)) {
            val x = if (childIsFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
            val y = flat(base + i)
            dot += x * y
            na += x * x
            nb += y * y
          }
          i += 1
        }
        sims(c) = if (na == 0.0 || nb == 0.0) 0.0
          else dot / (math.sqrt(na) * math.sqrt(nb))
        c += 1
      }
      // selection by (sim desc, id asc): k is small (nProbe ≤ centroids,
      // both aggregate-sized) — simple selection over nC entries
      val kOut = math.min(nProbe, nC)
      val picked = new Array[Boolean](nC)
      val out = new Array[Long](kOut)
      var r = 0
      while (r < kOut) {
        var best = -1
        var c2 = 0
        while (c2 < nC) {
          if (!picked(c2) && (best < 0 ||
              sims(c2) > sims(best) ||
              (sims(c2) == sims(best) && ids(c2) < ids(best)))) best = c2
          c2 += 1
        }
        picked(best) = true
        out(r) = ids(best)
        r += 1
      }
      new GenericArrayData(out)
    }
  }
}
