package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `rip_nfc(text)`: Unicode NFC normalization — the canonical-composition
  * pass every multilingual corpus pipeline needs before hashing,
  * deduping, or tokenizing (a decomposed "e"+U+0301 and a precomposed
  * U+00E9 are different byte strings, so every fingerprint/shingle/
  * exact-dedup operator in this library would treat equal-looking text
  * as distinct). Spark has no normalization built-in; this wraps the
  * JDK's `java.text.Normalizer` (the Unicode-standard NFC algorithm —
  * DuckDB's `nfc_normalize` implements the same standard, which is what
  * makes the q188 oracle possible) as a codegen'd expression: one
  * virtual call per row, no UDF, scan-speed. NFC is idempotent and
  * ASCII is a fixed point, so applying it defensively at ingest is
  * free on clean data.
  */
case class RipNfc(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rip_nfc requires a string argument, got ${other.sql}")
  }

  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: Normalizer.isNormalized is a cheap scan, and ASCII —
    // the overwhelming bulk of a text corpus — short-circuits it
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ripNfc", this, classOf[RipNfc].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): RipNfc =
    copy(child = newChild)
}
