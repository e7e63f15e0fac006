package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property gates for [[Exact.pico12]] / [[Exact.sum12]] (r12 — the
  * events.value sum family rides on them at every scale), including the
  * negative result that shaped them: the first r12 draft quantized with a
  * plain `CAST(v AS DECIMAL(38,12))`, and THIS SPEC caught that the native
  * double→decimal casts are different functions in different engines —
  * Spark rounds the SHORTEST-STRING repr (`BigDecimal.valueOf`, where
  * exact HALF_UP ties occur and the string-vs-binary gap can straddle a
  * grid midpoint), DuckDB rounds from the binary value (measured: 520 of
  * 2000 adversarial near-midpoint doubles quantized differently). The
  * portable quantizer makes every boundary decision an IEEE double op
  * (multiply, add, floor) instead, which no engine is free to vary.
  */
class ExactSpec extends SparkSpec {

  import spark.implicits._

  /** deterministic value pool shaped like events.value (positive, up to
    * ~1e4, many decimals) plus adversarial members parked near 1e-12-grid
    * midpoints — where quantizers that disagree, disagree
    */
  private val pool: Seq[Double] = {
    val organic = (1 to 4000).map { i =>
      // seedless, rerun-stable; spans magnitudes 1e-6 .. 1e4
      math.abs(math.sin(i * 2654435761.0)) * math.pow(10, (i % 11) - 6)
    }
    val nearMidpoints = (1 to 2000).map(k => k * 1e-12 + 5e-13)
    val shortTies = (1 to 500).map(k => 100.0 + k * 7e-3 + 5e-13)
    organic ++ nearMidpoints ++ shortTies
  }

  /** the two NATIVE cast semantics, emulated exactly:
    * Spark = shortest-string HALF_UP, DuckDB ≈ binary-value rounding
    */
  private def stringCast(d: Double): JBigDecimal =
    JBigDecimal.valueOf(d).setScale(12, RoundingMode.HALF_UP)
  private def binaryCast(d: Double): JBigDecimal =
    new JBigDecimal(d).setScale(12, RoundingMode.HALF_EVEN)

  test("the pitfall is real: shortest-string and binary-value decimal " +
    "casts disagree on the adversarial pool — a plain per-term CAST would " +
    "be a cross-engine divergence, not a fix") {
    val n = pool.count(d => stringCast(d).compareTo(binaryCast(d)) != 0)
    assert(n > 0,
      "no string-vs-binary cast disagreements left in the pool — the " +
        "fixture stopped demonstrating why pico12 avoids native casts")
  }

  test("pico12 equals the plain-JVM floor(v*1e12 + 0.5) on every pool " +
    "member (the engine really executes the portable IEEE rule)") {
    val got = pool.toDF("v")
      .select(Exact.pico12(col("v")).cast("string")).as[String].collect()
    pool.zip(got).foreach { case (d, s) =>
      val want = math.floor(d * 1e12 + 0.5)
      assert(new JBigDecimal(s).doubleValue() == want,
        s"pico12($d) = $s, expected $want")
    }
  }

  test("order-free: the sum12 total is bit-identical under reversed " +
    "input and different partitionings, where the double sum is not") {
    def s12(vs: Seq[Double], parts: Int): Long = {
      val d = vs.toDF("v").repartition(parts)
        .agg(Exact.sum12(col("v"))).head().getDouble(0)
      java.lang.Double.doubleToLongBits(d)
    }
    val a = s12(pool, 1)
    assert(a == s12(pool.reverse, 1), "reversal moved the sum")
    assert(a == s12(pool, 7), "repartitioning moved the sum")
    assert(a == s12(pool.sortBy(math.abs), 4),
      "magnitude-sorting moved the sum")
    // the disease being cured actually exists on this pool: plain double
    // accumulation IS order-dependent here (if this ever starts passing,
    // the pool stopped exercising anything and should be reshaped)
    val fwd = pool.foldLeft(0.0)(_ + _)
    val bwd = pool.reverse.foldLeft(0.0)(_ + _)
    assert(java.lang.Double.doubleToLongBits(fwd) !=
      java.lang.Double.doubleToLongBits(bwd),
      "double sums no longer order-sensitive on the pool — weak fixture")
  }

  test("the domain bound is enforced, not documentation (r13, VERDICT r12 " +
    "#3): in-domain values next to the 9e6 cliff still quantize exactly, " +
    "out-of-domain values fail LOUDLY instead of saturating silently") {
    // just under the enforced bound: the portable rule still holds bit-exact
    val nearBound = Seq(8999999.999999, -8999999.875, Exact.maxAbs - 1.0,
      1.0 - Exact.maxAbs)
    val got = nearBound.toDF("v")
      .select(Exact.pico12(col("v")).cast("string")).as[String].collect()
    nearBound.zip(got).foreach { case (d, s) =>
      assert(new JBigDecimal(s).doubleValue() == math.floor(d * 1e12 + 0.5),
        s"near-bound pico12($d) = $s")
    }
    // at/over the bound: the row errors — the saturation class
    // (Spark LONG floor clamps, DuckDB DOUBLE floor doesn't) can never
    // ship a silently-wrong total
    for (bad <- Seq(Exact.maxAbs, 9.3e6, -1.0e7, 1.0e18)) {
      val e = intercept[Exception] {
        Seq(bad).toDF("v").agg(Exact.sum12(col("v"))).collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("pico12")),
        s"out-of-domain $bad did not raise the pico12 domain error: $e")
    }
    // NULL still passes through as NULL, exactly as the bare floor did
    val nullRow = Seq[Option[Double]](None, Some(2.5)).toDF("v")
      .select(Exact.pico12(col("v"))).collect()
    assert(nullRow.count(_.isNullAt(0)) == 1)
  }

  test("per-term quantization error is bounded by 5e-13 + ~2 ulp of the " +
    "scaled term — at/below the value domain's own resolution") {
    pool.foreach { d =>
      val q = math.floor(d * 1e12 + 0.5) / 1e12
      // 5e-13 intended grid rounding + up to 1 ulp(p) from the product and
      // the +0.5 tie + half an ulp from each reconstruction op
      val bound = 5e-13 + 2 * math.ulp(d * 1e12) / 1e12 + math.ulp(d)
      assert(math.abs(q - d) <= bound,
        s"quantization of $d drifted ${math.abs(q - d)} > $bound")
    }
  }
}
