package graft.functions.expr

import java.util.zip.Deflater
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** zlib-deflated byte length of a string — the primitive behind the
  * compression-ratio quality filter (RefinedWeb/MassiveText family): text
  * whose deflated size is a small fraction of its raw size is repetitive
  * boilerplate (keyword stuffing, template spam), and text that barely
  * compresses below a natural-language baseline is noise/binary junk.
  * Both tails get cut; the ratio needs only the LENGTH of the compressed
  * stream, so nothing is allocated beyond one reusable scratch buffer.
  *
  * Imperative byte-twiddling has no Column-function spelling, so this is
  * the documented custom-Expression tier (b): nullSafeCodeGen'd static
  * call, same shape as [[Nfc]] — inside whole-stage codegen, never a UDF.
  * Determinism: JDK Deflater at a FIXED level with default strategy is a
  * pure function of the input bytes on a given JVM — stable across
  * partitionings and retries, which is what the engine's reproducibility
  * contract needs. It is NOT specified stable across zlib builds, so
  * cross-engine oracles must be property-based (flags), not value-based.
  */
object DeflateLen {

  /** Deflate `s`'s UTF-8 bytes at compression level 6 (zlib default) and
    * return the compressed length. A fresh Deflater per call keeps the
    * function pure; the dominant cost is the deflate itself.
    */
  def deflatedLength(s: UTF8String): Int = {
    val bytes = s.getBytes
    val d = new Deflater(6)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
}

/** `graft_deflate_len(text) -> int` as a native expression. */
case class GraftDeflateLen(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_deflate_len"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    DeflateLen.deflatedLength(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expr.DeflateLen.deflatedLength($c);")

  override protected def withNewChildInternal(newChild: Expression): GraftDeflateLen =
    copy(child = newChild)
}
