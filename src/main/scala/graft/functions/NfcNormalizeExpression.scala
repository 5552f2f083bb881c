package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `nfc_normalize(text)` — Unicode NFC (canonical composition)
  * normalization, the first step of the ftfy-style text-cleanup pass
  * ([[TextNormalize.cleanText]]): the same logical character arrives
  * from real crawls as either a precomposed codepoint (`é` = U+00E9)
  * or a base + combining mark (`e` + U+0301), and singleton
  * compatibility points (the U+212B ANGSTROM SIGN vs `Å` U+00C5)
  * split what every downstream EXACT operator — dedup keys
  * ([[graft.operators.TextDedup]]), paragraph/substring hashes,
  * blocklist token equality — must see as one string. NFC (not NFKC)
  * deliberately: canonical equivalence only, no lossy compatibility
  * folding (ligatures, super/subscripts stay).
  *
  * Spark has no built-in for this; the JDK's `java.text.Normalizer`
  * implements the same Unicode Normalization Algorithm (UAX #15) as
  * DuckDB's `nfc_normalize` (utf8proc), which is what makes the
  * cross-engine oracle possible.
  *
  * Scale shape: per-row, no shuffle, codegen'd via a static call. The
  * dominant real-corpus case (pure-ASCII row) is a single byte scan —
  * ASCII is closed under NFC, so the input buffer is returned
  * untouched, no String round-trip.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def prettyName: String = "nfc_normalize"
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects a string column, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    NfcNormalize.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize.compute($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object NfcNormalize {

  /** NFC-normalize one value. ASCII fast path first (every byte
    * < 0x80 ⇒ already NFC — no decode, no allocation), then the JDK
    * quick-check (`isNormalized` walks the string without building a
    * new one — most non-ASCII text is ALREADY composed), and only
    * then the real normalization. */
  def compute(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if ((s.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
