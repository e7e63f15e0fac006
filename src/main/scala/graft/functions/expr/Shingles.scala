package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass word n-gram shingles (r16 optimization round): the native form
  * of the hot-path sandwich
  *
  * {{{ arrayBarrier(array_distinct(shinglesFromTokens(toks, n))) }}}
  *
  * which today evaluates as INTERPRETED higher-order functions
  * (`transform`/`slice`/`sequence` are CodegenFallback) plus a per-row
  * Catalyst↔Scala round-trip through the barrier UDF — measured as the
  * bulk of the shingle pipeline's map cost at sf0.1. This expression builds
  * the same array in one compiled row-local loop and stays inside
  * whole-stage codegen (guide §1.2 step 2 / §4.1: prefer codegen'd
  * built-ins over interpreted trees in the hot path).
  *
  * Value contract — BIT-IDENTICAL to the declarative chain it replaces
  * (gated by ShinglesExprSpec against that exact chain):
  *
  *   - shingle i = `concat_ws(" ", slice(toks, i+1, n))`: the n tokens
  *     joined by a single 0x20 space via the same `UTF8String.concatWs`
  *     Spark's ConcatWs calls (NULL elements skipped, exactly like
  *     concat_ws — token arrays from `tokens()` never carry NULLs, but the
  *     semantics match regardless);
  *   - fewer than `n` tokens (including zero) → EMPTY array — the
  *     `when(size >= n, ...).otherwise(array())` branch;
  *   - NULL token array → NULL (the chain yields `[]` there, but every
  *     consumer either explodes the array or filters `size > 0`, under
  *     which NULL and `[]` are indistinguishable; call sites are audited);
  *   - `distinct = true` keeps the FIRST occurrence of each shingle in
  *     scan order — `array_distinct`'s order, under the same binary
  *     UTF8String equality.
  *
  * The expression is deliberately NON-DETERMINISTIC-flagged: that is the
  * [[graft.functions.TextFunctions.arrayBarrier]] optimizer contract
  * (InferFiltersFromGenerate + pushdown would otherwise clone the whole
  * loop into a per-row scan filter — the measured-17× pathology), now at
  * zero per-row cost because the barrier no longer round-trips the array
  * through a Scala UDF.
  */
object Shingles {

  private val Sep = UTF8String.fromString(" ")

  /** Codegen/eval entry: token ArrayData in, shingle ArrayData out (empty
    * array for docs shorter than `n`; caller handles NULL input).
    */
  def compute(toks: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val m = toks.numElements() - n + 1
    if (m <= 0) return new GenericArrayData(new Array[Any](0))
    def make(i: Int): UTF8String = {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      UTF8String.concatWs(Sep, parts: _*)
    }
    if (distinct) {
      // capacity clamped via Long math (ADVICE r16 #1): m * 2 in Int
      // overflows negative for a >2^30-shingle doc and the constructor
      // would throw instead of processing it
      val seen = new java.util.LinkedHashSet[UTF8String](
        math.min(math.max(m.toLong, 8L) * 2L, 1L << 16).toInt)
      var i = 0
      while (i < m) { seen.add(make(i)); i += 1 }
      new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size))
        .asInstanceOf[Array[Any]])
    } else {
      val out = new Array[Any](m)
      var i = 0
      while (i < m) { out(i) = make(i); i += 1 }
      new GenericArrayData(out)
    }
  }
}

/** `graft_shingles(toks, n, distinct) -> array<string>` — see [[Shingles]]. */
case class GraftShingles(child: Expression, shingleN: Int, distinct: Boolean)
    extends UnaryExpression {
  require(shingleN > 0, "shingleN must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true // NULL token array yields NULL
  // the arrayBarrier contract: never inlined into inferred Generate filters,
  // never pushed below the materializing projection (values ARE
  // deterministic; this is only the optimizer fence)
  override lazy val deterministic: Boolean = false
  override def prettyName: String = "graft_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Shingles.compute(input.asInstanceOf[ArrayData], shingleN, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // nullable=true always holds, so ev.isNull exists in every
    // instantiation (the doGenCode gotcha in the verify skill); compute
    // never returns null for non-null input, so no re-check needed
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.expr.Shingles.compute($c, $shingleN, $distinct);
    """)

  override protected def withNewChildInternal(newChild: Expression): GraftShingles =
    copy(child = newChild)
}
