package graft.functions.expr

import java.text.Normalizer
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC (canonical composition) — the normalization step ahead of
  * fingerprinting/dedup that Spark has no built-in for (reference
  * corollary: the reference's CSV corpus is ASCII, but any crawl corpus
  * carries decomposed accents, so `"Café"` in NFD and NFC must dedup as one
  * document). DuckDB's `nfc_normalize` implements the same Unicode
  * algorithm (utf8proc), so the operator is fully hash-oracle-able —
  * NormalizeSpec and the q_normalize_text gate pin the cross-engine
  * agreement, including canonical REORDERING of stacked combining marks
  * (dot-below sorts before dot-above), not just pairwise composition.
  */
object Nfc {

  /** Codegen/eval entry. The `isNormalized` probe is the hot-path guard: a
    * corpus is overwhelmingly already-NFC (all ASCII is), and the probe is
    * a scan that usually exits on the first character class lookup, so the
    * common row pays no String rebuild or copy — the ORIGINAL UTF8String
    * flows through untouched.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

/** `graft_nfc(text) -> string` as a native expression. */
case class GraftNfc(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    Nfc.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expr.Nfc.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): GraftNfc =
    copy(child = newChild)
}
