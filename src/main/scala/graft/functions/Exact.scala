package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.types.DecimalType

/** Cross-engine-exact aggregation casts — the r12 extension of the r11
  * price `exactSum` family (see [[graft.queries.CoreQueries]]'s scaladoc)
  * to CONTINUOUS double columns like `events.value`.
  *
  * Prices are exact 2-dp decimals stored as doubles, so their
  * DECIMAL(38,2) cast is lossless. A continuous measurement has no such
  * grid — any finite-scale cast quantizes it — but the FAILURE MODE the
  * cast removes is the same: a double SUM is order-dependent, its
  * cross-engine / cross-partitioning drift grows with the group's row
  * count, and the post-sum FLOOR snap's `drift < grain/2` assumption is a
  * margin CLIFF (~grain × 5e13, measured in the r11 sf1 shakeout on price
  * sums; the value family carried the same latent class with a "~8 orders
  * of margin" argument instead of a gate — VERDICT r11 #3). Quantizing
  * each term onto the 1e-12 decimal grid FIRST makes the sum order-free
  * exact decimal arithmetic: both engines add the identical decimals and
  * get the bit-identical total at ANY row count and any partitioning, so
  * the snap that follows is pure output formatting, never a drift
  * absorber, and the cliff is unreachable by construction.
  *
  * The per-term cast is tie-free — a halfway point of the 1e-12 grid is
  * `(2k+1)/(2^13·5^12)`, never a dyadic fraction, so no double ever sits
  * on one and Spark's HALF_UP vs DuckDB's rounding cannot disagree — and
  * deterministic, so both engines quantize each term identically. The
  * 1e-12 grid sits at/below the ulp of the value domain (|value| ≲ 1e4 ⇒
  * ulp ≲ 2e-12): quantization error per term ≤ 5e-13, invisible at the
  * 1e-2 / 1e-6 output grains until ~1e6 adversarially-rounding rows per
  * group, at which point BOTH engines still agree bit-exactly — agreement,
  * not the true real-number sum, is what the hash gate certifies.
  *
  * SQL twin: `CAST(SUM(CAST(x AS DECIMAL(38,12))) AS DOUBLE)`. DECIMAL
  * sums stay partial-aggregable (map-side combine) in Spark and INT128-
  * backed in DuckDB; 26 integer digits bound overflow at ~1e22 rows.
  */
object Exact {

  /** The 1e-12-grid decimal cast: wrap each double term, sum, then cast
    * the one total back to double (correctly rounded in both engines).
    * Usable inside plain aggs, window frames, and streaming aggs alike:
    * `sum(Exact.dec12(c)).cast("double")`.
    */
  def dec12(c: Column): Column = c.cast(DecimalType(38, 12))
}
