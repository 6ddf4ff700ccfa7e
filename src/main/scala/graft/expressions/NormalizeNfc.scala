package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Unicode NFC normalization — the canonical-composition pass a
 * web-corpus pipeline runs before anything tokenizes or hashes
 * (CCNet normalizes before LM scoring; without it `café` spelled
 * e+U+0301 and precomposed U+00E9 are different tokens, different
 * shingles, different dedup keys). Spark has no built-in normalizer
 * and a UDF would box every row out of codegen; this stays a
 * whole-stage-codegen one-liner around `java.text.Normalizer`.
 *
 * ASCII fast path: NFC can never change pure-ASCII text, and
 * `UTF8String` exposes the byte check for free — the common web
 * corpus row costs one scan and ZERO allocations (no toString, no
 * isNormalized walk). Engine-portable: DuckDB's `nfc_normalize`
 * implements the same Unicode canonical composition, so the oracle
 * replays md5-for-md5.
 */
case class NormalizeNfc(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "normalize_nfc"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"normalize_nfc requires a string column, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    NormalizeNfc.nfc(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.NormalizeNfc.nfc($c);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object NormalizeNfc {
  /** The kernel, callable from generated Java (static forwarder). */
  def nfc(u: UTF8String): UTF8String = {
    // pure-ASCII bytes are NFC by definition — return the input
    // buffer untouched (the overwhelmingly common case; Spark's own
    // vectorized ASCII check, no toString)
    if (u.isFullAscii) return u
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }
}
