package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{abs, floor, format_string, lit, raise_error, sum, when}
import org.apache.spark.sql.types.DecimalType

/** Cross-engine-exact aggregation for CONTINUOUS double columns like
  * `events.value` — the r12 extension of the r11 price `exactSum` family
  * (see [[graft.queries.CoreQueries]]'s scaladoc).
  *
  * Prices are exact 2-dp decimals stored as doubles, so their
  * DECIMAL(38,2) cast is lossless. A continuous measurement has no such
  * grid — any finite-scale quantization rounds it — but the FAILURE MODE
  * being removed is the same: a double SUM is order-dependent, its
  * cross-engine / cross-partitioning drift grows with the group's row
  * count, and the post-sum FLOOR snap's `drift < grain/2` assumption is a
  * margin CLIFF (~grain × 5e13, measured in the r11 sf1 shakeout on price
  * sums). Quantizing each term FIRST makes the sum order-free exact
  * decimal arithmetic: both engines add identical integers and get the
  * bit-identical total at ANY row count and partitioning, so the snap
  * that follows is pure output formatting, never a drift absorber.
  *
  * WHY NOT a plain `CAST(v AS DECIMAL(38,12))` per term: the native
  * double→decimal casts are NOT the same function in the two engines —
  * caught by ExactSpec in the same round that introduced the cast. Spark
  * rounds the SHORTEST-STRING decimal repr (`Decimal(double)` goes
  * through `BigDecimal.valueOf`, i.e. `Double.toString`), where exact
  * HALF_UP ties occur (e.g. 94.1045753771255 → …126 although its binary
  * value …12549935… rounds down) and where the string-vs-binary gap can
  * straddle a grid midpoint on ~0.2% of random 17-digit doubles; DuckDB
  * rounds from the binary value. 520 of 2000 adversarial near-midpoint
  * values quantized differently — the exact latent-divergence class this
  * helper exists to kill.
  *
  * THE PORTABLE QUANTIZER instead makes every boundary decision an IEEE
  * double operation, bit-identical in any IEEE engine by specification
  * (the repo-wide `FLOOR(x*s + 0.5)` snap convention, applied per term):
  *
  *   pico(v)  = FLOOR(v * 1e12 + 0.5)      — an integer, in 1e-12 units;
  *                                           product and floor are the
  *                                           same correctly-rounded ops
  *                                           everywhere, no ties exist
  *   total    = SUM(CAST(pico AS DECIMAL(38,0)))  — exact, order-free,
  *                                           partial-aggregable (map-side
  *                                           combine; INT128 in DuckDB)
  *   result   = CAST(total AS DOUBLE) / 1e12 — two correctly-rounded ops
  *
  * The integer-valued double→DECIMAL(38,0) cast is exact in both engines
  * (no fractional digits, nothing to round). Quantization error is
  * ≤ 5e-13 + ~2·ulp(v·1e12)/1e12 per term (ExactSpec gates the bound) —
  * at/below the value domain's own resolution — and, unlike the old
  * post-sum snap, both engines carry the IDENTICAL quantized value, so
  * agreement (what the hash gate certifies) holds at any scale even where
  * the tiny bias accumulates.
  *
  * Domain bound — ENFORCED at runtime since r13 (VERDICT r12 #3):
  * |v| < [[Exact.maxAbs]] = 9e6 keeps `pico` inside Spark's LONG-typed
  * floor (events.value sits ~4 orders under it). Past ~9.22e6 Spark's
  * floor SATURATES at Long.MaxValue while DuckDB's DOUBLE floor does
  * not — a silent cross-engine divergence class — so [[pico12]] raises
  * (one codegen'd branch per term) instead of wrapping: a future
  * wider-domain table fails its first run loudly. For wider domains,
  * pre-scale the term (the q_time_weighted site multiplies the EXACT
  * pico decimal by its integer weight instead of quantizing the
  * product).
  *
  * SQL twin (single-sourced in callers' oracle strings):
  * `CAST(SUM(CAST(FLOOR(x * 1e12 + 0.5) AS DECIMAL(38,0))) AS DOUBLE) / 1e12`.
  */
object Exact {

  /** The quantizer's enforced value domain: |v| < 9e6 (conservative under
    * the exact LONG-floor saturation point ≈ 9.223372e6).
    */
  val maxAbs: Double = 9e6

  /** The per-term picounit quantizer: an exact DECIMAL(38,0) integer in
    * 1e-12 units. Compose freely: `sum(pico12(c))` in aggs, window frames
    * and streaming aggs alike, then `.cast("double") / 1e12`; or multiply
    * by an exact integer weight BEFORE the sum (q_time_weighted).
    * NULL passes through as NULL (exactly as the bare floor did); a value
    * outside (−[[maxAbs]], [[maxAbs]]) raises at runtime — see the domain
    * bound note above.
    */
  def pico12(c: Column): Column =
    when(c.isNull, lit(null).cast(DecimalType(38, 0)))
      .when(abs(c) < lit(maxAbs),
        floor(c * lit(1e12) + lit(0.5)).cast(DecimalType(38, 0)))
      .otherwise(raise_error(format_string(
        "Exact.pico12: %s is outside the quantizer domain |v| < 9e6 " +
          "(the LONG-typed floor saturates past ~9.22e6); pre-scale the " +
          "term or use a coarser grid", c)))

  /** The full plain-aggregate spelling: order-free exact sum of `c`
    * quantized at 1e-12, back as DOUBLE.
    */
  def sum12(c: Column): Column =
    sum(pico12(c)).cast("double") / lit(1e12)
}
