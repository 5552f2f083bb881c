package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `word_shingles(text, n)` — the DISTINCT word-n-gram shingle set of a
  * string, as a native expression: split once, slide a window, dedupe in
  * an insertion-ordered set, one loop per row.
  *
  * Semantically ≡ `array_distinct(word_ngrams(text, n))` (the HOF
  * spelling kept in [[GraftFunctions.word_ngrams]] as the executable
  * spec, equality asserted in TextDedupSpec). Exists for the same reason
  * as [[MinHashSignature]]: the HOF composition is CodegenFallback and
  * walks an interpreted lambda tree per shingle — measured ~2.5 s of a
  * 5 000-doc shingling stage that is ~20 ms of actual string work.
  */
case class WordShingles(child: Expression, n: Int, sep: String = " ")
  extends UnaryExpression {
  require(n >= 1, s"n=$n must be >= 1")

  override def prettyName: String = "word_shingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects a string column, got $other")
  }

  @transient private lazy val pattern: Pattern = Pattern.compile(Pattern.quote(sep))

  override def nullSafeEval(v: Any): Any =
    WordShingles.compute(v.asInstanceOf[UTF8String], n, sep, pattern)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patRef = ctx.addReferenceObj("pattern", pattern, classOf[Pattern].getName)
    val sepRef = ctx.addReferenceObj("sep", sep, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingles.compute($c, $n, $sepRef, $patRef);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object WordShingles {
  /** Static so the generated Java can call it directly. */
  def compute(text: UTF8String, n: Int, sep: String, pattern: Pattern): ArrayData = {
    val words = pattern.split(text.toString, -1)
    if (words.length < n)
      return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]
    var i = 0
    while (i + n <= words.length) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(sep)
        sb.append(words(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var m = 0
    while (it.hasNext) { out(m) = UTF8String.fromString(it.next()); m += 1 }
    new GenericArrayData(out)
  }
}
