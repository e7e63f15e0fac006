package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** One-pass 64-bit SimHash over a token array (r16 optimization round):
  * the native form of [[graft.operators.Dedup.simhash]]'s
  * explode → xxhash64 → 64-conditional-sum aggregation — per document, one
  * row-local loop accumulating the 64 bit votes, with NO token explode
  * (one row per token occurrence, ~500× the doc count) and NO 64-aggregate
  * exchange. The PortableMinSig precedent applied to the SimHash family.
  *
  * Value contract (bit-identical to the aggregation spelling):
  *
  *   - per token occurrence (NOT distinct — every occurrence votes, like
  *     the explode), h = `xxhash64(token)` — the same
  *     [[XxHash64Function]] with Spark's default seed 42 the Column
  *     spelling evaluates;
  *   - vote j += 1 when bit j of h is set, −1 otherwise — integer sums,
  *     order-independent, so the row-local accumulation is EXACTLY the
  *     distributed aggregation's result;
  *   - bit j of the output is set iff vote j > 0 (ties at 0 clear the
  *     bit, matching `when(b > 0, ...)`);
  *   - empty or NULL token array → NULL — the rows the explode pipeline
  *     emitted no aggregation group for (callers filter `isNotNull` to
  *     reproduce "doc absent from the hash relation").
  */
object Simhash {

  private final val Seed = 42L

  /** Codegen/eval entry: token ArrayData in, boxed simhash (or null for an
    * empty array) out.
    */
  def compute(toks: ArrayData): java.lang.Long = {
    val n = toks.numElements()
    if (n == 0) return null
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = XxHash64Function.hash(toks.getUTF8String(i), StringType, Seed)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) out |= (1L << j); j += 1 }
    java.lang.Long.valueOf(out)
  }
}

/** `graft_simhash(toks) -> bigint` — see [[Simhash]]. */
case class GraftSimhash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true // empty/NULL token array yields NULL
  // the arrayBarrier contract (see GraftShingles): stops predicate pushdown
  // from cloning the whole vote loop below the materializing projection
  // (the isNotNull filter in Dedup.simhash would otherwise evaluate it a
  // second time per row at the scan); values are deterministic
  override lazy val deterministic: Boolean = false
  override def prettyName: String = "graft_simhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Simhash.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // nullable=true always holds, so ev.isNull exists in every
    // instantiation (the doGenCode gotcha in the verify skill)
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long ${ev.value}$$boxed = graft.functions.expr.Simhash.compute($c);
      if (${ev.value}$$boxed == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}$$boxed.longValue(); }
    """)

  override protected def withNewChildInternal(newChild: Expression): GraftSimhash =
    copy(child = newChild)
}
