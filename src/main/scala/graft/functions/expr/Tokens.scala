package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass whitespace tokenizer (r17 optimization round): the native form
  * of the engine's universal tokenizer
  *
  * {{{ filter(split(lower(text), "\\s+"), t => length(t) > 0) }}}
  *
  * which evaluates as Lower (one UTF8String copy) → StringSplit (a
  * `java.util.regex` split that converts the row to `java.lang.String`,
  * compiles/boxes through `Pattern` machinery, and allocates a `String` +
  * re-encoded `UTF8String` per token) → ArrayFilter (an INTERPRETED
  * higher-order function with a per-element lambda). This expression
  * produces the same array in one compiled row-local byte scan
  * (guide §1.2 step 2 / §4.1) and is the single largest remaining
  * interpreted/regex hot-path cost named by VERDICT r16 #4.
  *
  * Value contract — BIT-IDENTICAL to the declarative chain it replaces
  * (gated by TokensExprSpec against that exact chain on fixtures AND the
  * real corpus):
  *
  *   - lowercasing is `UTF8String.toLowerCase` — the same call `lower()`
  *     makes (ASCII fast path, full Unicode otherwise);
  *   - Java-regex `\s` matches exactly the six ASCII bytes
  *     0x09–0x0D and 0x20, and never a byte inside a multi-byte UTF-8
  *     sequence (those are ≥ 0x80), so a byte-level scan splits at
  *     exactly the positions the regex does;
  *   - `split(str, "\\s+", -1)` yields empty strings only at a leading /
  *     trailing separator run (a `\s+` match can't be zero-width), and the
  *     `length(t) > 0` filter removes exactly those — the surviving tokens
  *     are the maximal runs of non-whitespace characters, which is what
  *     the scan emits directly;
  *   - NULL text → NULL (Lower, StringSplit and ArrayFilter are all
  *     null-propagating); empty/all-whitespace text → empty array.
  *
  * Unlike [[GraftShingles]] this expression stays DETERMINISTIC: the
  * declarative chain it replaces carried no optimizer barrier, so keeping
  * the flag preserves every call site's plan shape (filter pushdown
  * included) — the change is per-row evaluation cost only.
  */
object Tokens {

  @inline private def isSpace(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0D)

  /** Codegen/eval entry: text in, token ArrayData out (caller handles NULL
    * input). One `toLowerCase` copy, then zero-copy slices of its byte
    * array.
    */
  def compute(text: UTF8String): ArrayData = {
    val lowered = text.toLowerCase
    val b = lowered.getBytes
    val n = b.length
    // count first: token arrays are built exactly-sized (no growable
    // buffer churn on the hot path)
    var count = 0
    var i = 0
    while (i < n) {
      if (!isSpace(b(i))) {
        count += 1
        i += 1
        while (i < n && !isSpace(b(i))) i += 1
      } else i += 1
    }
    val out = new Array[Any](count)
    var k = 0
    i = 0
    while (i < n) {
      if (!isSpace(b(i))) {
        val start = i
        i += 1
        while (i < n && !isSpace(b(i))) i += 1
        out(k) = UTF8String.fromBytes(b, start, i - start)
        k += 1
      } else i += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_tokens(text) -> array<string>` — see [[Tokens]]. */
case class GraftTokens(child: Expression) extends UnaryExpression {

  // containsNull = false matches the chain exactly (TokensExprSpec pins the
  // equality): Spark 4's `split` types its result
  // ArrayType(StringType, containsNull = false) and ArrayFilter preserves
  // it — the declared type must not change or downstream nullability
  // (explode outputs, aggregates) could drift the output schemas the
  // driver hash-compares
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true // NULL text yields NULL
  override def prettyName: String = "graft_tokens"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Tokens.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // nullable=true always holds, so ev.isNull exists in every
    // instantiation (the doGenCode gotcha in the verify skill); compute
    // never returns null for non-null input, so no re-check needed
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.expr.Tokens.compute($c);
    """)

  override protected def withNewChildInternal(newChild: Expression): GraftTokens =
    copy(child = newChild)
}
