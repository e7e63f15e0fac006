package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64, XxHash64Function}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** One-pass xxhash64-family MinHash signatures (r16 optimization round):
  * the production-default sibling of [[PortableMinSig]] — all `nPerms`
  * per-document minimums of the seeded-xxhash64 family in a single
  * row-local loop, replacing [[graft.operators.Dedup.minhashBandBuckets]]'
  * shingle explode + 32-min-aggregate exchange.
  *
  * Value contract (bit-identical to the Column spelling it replaces):
  *
  *   - shingle i = tokens[i..i+n−1] joined by one 0x20 space (the
  *     [[Shingles]] bytes — `concat_ws(" ", slice(toks, i, n))`);
  *   - draw p of shingle s replays `xxhash64(s, lit(p))` exactly:
  *     XxHash64 folds children left-to-right from seed 42, so the value is
  *     `hashInt(p, hash(s, 42))` — the shingle's string hash is computed
  *     ONCE and the 32 seed draws are integer folds (the Column spelling
  *     re-hashed the string bytes per permutation: 32× the string-hash
  *     work this loop avoids ON TOP of the removed explode/exchange);
  *   - `derivePerms = true` replays the fastsig variant
  *     (`xxhash64(xxhash64(s), lit(p))`): one extra
  *     `hashLong(hash(s, 42), 42)` fold before the integer draws;
  *   - sig(p) = min over shingle OCCURRENCES — min is duplicate- and
  *     order-insensitive, so the row-local loop equals the distributed
  *     aggregation bit-for-bit;
  *   - fewer than `shingleN` tokens, or NULL tokens → NULL — the docs the
  *     explode pipeline emitted no aggregation group for (callers filter
  *     `isNotNull`).
  */
object XxMinSig {

  private final val SparkSeed = 42L

  /** Codegen/eval entry: token ArrayData in, signature long[] as ArrayData
    * (or null when fewer than `shingleN` tokens) out.
    */
  def compute(toks: ArrayData, shingleN: Int, nPerms: Int,
      derivePerms: Boolean): ArrayData = {
    val m = toks.numElements() - shingleN + 1
    if (m <= 0) return null
    val mins = new Array[Long](nPerms)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val parts = new Array[org.apache.spark.unsafe.types.UTF8String](shingleN)
    val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    var i = 0
    while (i < m) {
      var j = 0
      while (j < shingleN) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      val sh = org.apache.spark.unsafe.types.UTF8String.concatWs(sep, parts: _*)
      var h = XxHash64Function.hash(sh, StringType, SparkSeed)
      if (derivePerms) h = XXH64.hashLong(h, SparkSeed)
      var p = 0
      while (p < nPerms) {
        val v = XXH64.hashInt(p, h)
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(mins)
  }
}

/** `graft_xx_minsig(toks) -> array<bigint>` — see [[XxMinSig]]. */
case class GraftXxMinSig(child: Expression, shingleN: Int, nPerms: Int,
    derivePerms: Boolean)
    extends UnaryExpression {
  require(shingleN > 0, "shingleN must be positive")
  require(nPerms > 0, "nPerms must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // short docs yield NULL
  // the arrayBarrier contract (see GraftShingles): the isNotNull consumer
  // filter must not clone the whole signature loop below the projection
  override lazy val deterministic: Boolean = false
  override def prettyName: String = "graft_xx_minsig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    XxMinSig.compute(input.asInstanceOf[ArrayData], shingleN, nPerms, derivePerms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // nullable=true always holds, so ev.isNull exists in every
    // instantiation (the doGenCode gotcha in the verify skill)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.expr.XxMinSig.compute($c, $shingleN, $nPerms, $derivePerms);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): GraftXxMinSig =
    copy(child = newChild)
}
