package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd Catalyst expression.
  *
  * Text corpora mix precomposed ("é" U+00E9) and combining ("e"+U+0301)
  * forms of the same glyph; every downstream fingerprint / dedup / shingle
  * hash treats them as different bytes unless normalization runs first, so
  * a curation pipeline applies NFC before anything content-addressed
  * (Dolma and C4 both normalize up front). Spark has no built-in for this
  * (`lower`/`trim` are form-preserving), and a Scala UDF would leave
  * whole-stage codegen — hence the custom-Expression tier, same as
  * [[DotProduct]].
  *
  * Fast path: `Normalizer.isNormalized` is O(n) with no allocation and is
  * true for virtually all real text (all-ASCII text trivially so); only
  * rows that actually need recomposition pay for `normalize`.
  *
  * Oracle twin: DuckDB's `nfc_normalize(text)`.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_nfc needs a STRING argument, got ${child.dataType.sql}")
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object NfcNormalize {
  /** Static entry shared by interpreted eval and generated code. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
