package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled body behind [[NfcNormalize]] — called from generated code.
  *
  * Unicode NFC (canonical composition) via the JDK's
  * `java.text.Normalizer`: the Unicode standard fully specifies the
  * mapping, so the result is engine-portable — DuckDB's
  * `nfc_normalize` produces byte-identical output, which is what makes
  * the operator oracle-gateable. The `isNormalized` fast path skips
  * the allocation for the (dominant at corpus scale) already-composed
  * case: crawled text is mostly NFC already, and the quick-check walk
  * is a single pass with no copy. */
object TextNormImpl {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** `nfc_normalize(text)` → NFC-composed string.
  *
  * Text normalization is the first step of every curation pipeline —
  * exact dedup keys, shingle hashes, and token counts all diverge if
  * `é` appears both composed (U+00E9) and decomposed (U+0065 U+0301)
  * in the corpus. Quokka leaves this to its Polars/DuckDB UDF layer;
  * here it is a codegen'd Catalyst expression so normalization stays
  * inside the scan's whole-stage-codegen span (reference surface:
  * `/root/reference/pyquokka/datastream.py` `with_columns` string
  * transforms). */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string argument, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any =
    TextNormImpl.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNormImpl.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
  override def prettyName: String = "nfc_normalize"
}
