package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
  * the MOSS algorithm): Rabin-Karp rolling hashes over byte k-grams, then
  * the rightmost minimum of each w-window of hashes, deduplicated by
  * position. Guarantees: any shared substring of length ≥ w+k−1 between two
  * documents yields at least one shared fingerprint, and edits only perturb
  * fingerprints within a window of the edit site.
  *
  * The loop is O(n) — rolling update + monotonic deque for window minima —
  * implemented once here and shared by interpreted eval and codegen (the
  * generated code calls this static method; the loop is compiled JVM code
  * either way, and the expression itself stays inside whole-stage codegen).
  */
object Winnow {

  private final val Base = 257L

  /** O(n) winnow: selected k-gram hashes in document order (positions
    * deduplicated, values may legitimately repeat for repeated content).
    */
  def compute(bytes: Array[Byte], k: Int, w: Int): Array[Long] = {
    val n = bytes.length
    if (n < k) return Array.emptyLongArray
    val m = n - k + 1
    val hashes = new Array[Long](m)
    var pow = 1L
    var i = 1
    while (i < k) { pow *= Base; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * Base + (bytes(i) & 0xffL); i += 1 }
    hashes(0) = h
    i = 1
    while (i < m) {
      h = (h - (bytes(i - 1) & 0xffL) * pow) * Base + (bytes(i + k - 1) & 0xffL)
      hashes(i) = h
      i += 1
    }
    if (m <= w) {
      // document shorter than one window: single global (rightmost) min
      var best = 0
      i = 1
      while (i < m) { if (hashes(i) <= hashes(best)) best = i; i += 1 }
      return Array(hashes(best))
    }
    // monotonic deque of indices; popping on >= makes the FRONT the
    // rightmost minimum of the current window (classic winnowing tie rule)
    val deque = new Array[Int](m)
    var head = 0; var tail = 0 // [head, tail)
    val out = new Array[Long](m - w + 1)
    var nOut = 0
    var lastSel = -1
    i = 0
    while (i < m) {
      while (tail > head && hashes(deque(tail - 1)) >= hashes(i)) tail -= 1
      deque(tail) = i; tail += 1
      val windowStart = i - w + 1
      if (windowStart >= 0) {
        while (deque(head) < windowStart) head += 1
        val sel = deque(head)
        if (sel != lastSel) { out(nOut) = hashes(sel); nOut += 1; lastSel = sel }
      }
      i += 1
    }
    java.util.Arrays.copyOf(out, nOut)
  }

  /** Codegen/eval entry: UTF8String in, Catalyst array out. */
  def fingerprint(s: UTF8String, k: Int, w: Int): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(compute(s.getBytes, k, w))
}

/** `graft_winnow(text, k, w) -> array<bigint>` as a native expression. */
case class GraftWinnow(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k > 0 && w > 0, "winnow k and w must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    Winnow.fingerprint(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expr.Winnow.fingerprint($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): GraftWinnow =
    copy(child = newChild)
}
