package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine query: a DataFrame builder plus (when the semantics are
  * ANSI-expressible) an equivalent DuckDB SQL oracle for the driver's
  * differential-correctness gate (Verify.scala → CORRECTNESS_r{N}.json).
  *
  * Cross-engine determinism rules used throughout the inventory:
  *   - per-row arithmetic (+,-,*,/ on doubles) is IEEE-754-exact in both
  *     engines → safe to emit raw;
  *   - sums/avgs over *integer-valued* doubles (l_quantity) are exact in
  *     double → safe;
  *   - sums over fractional doubles (prices) accumulate in engine-specific
  *     order → snapped back to their *true* decimal precision with the
  *     IEEE-pure form FLOOR(x*10^k + 0.5)/10^k (never ROUND: engine rounding
  *     modes disagree exactly at the .XX5 midpoints that 2-decimal sums hit);
  *     averages over such sums are derived as rounded_sum / count;
  *   - COUNT/MIN/MAX are exact; DuckDB SUM(int) returns HUGEINT so integer
  *     counting is always expressed as COUNT(CASE ...) in oracles;
  *   - calendar parts are CAST to INT on the DuckDB side (its date parts are
  *     BIGINT, Spark's are INT);
  *   - events.ts is µs-precision in both engines regardless of the
  *     testdata generation's parquet encoding ([[Tables.load]] normalizes
  *     ns-as-long by truncation and TIMESTAMP_NTZ by UTC-instant cast, both
  *     to µs TimestampType; DuckDB reads the same file natively at µs), so
  *     unix_micros ↔ epoch_us(CAST(ts AS TIMESTAMP)) is exact — tie
  *     boundaries in as-of joins / resampling agree bit-for-bit.
  */
final case class QueryDef(
    name: String,
    oracle: Option[String],
    build: (SparkSession, String) => DataFrame)
