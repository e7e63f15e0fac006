package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-at-or-before) join — the canonical time-series lookup:
  * for every left row, attach columns from the single right row with the
  * largest `ts <= left.ts` within the same key, or NULLs when no such row
  * exists. Matches DuckDB's `ASOF LEFT JOIN ... ON l.k = r.k AND l.ts >= r.ts`
  * semantics, which the oracle uses as the independent implementation.
  *
  * Spark has no native as-of join, and the naive formulations both fail at
  * scale: an inequality theta-join explodes to a per-key cartesian before
  * aggregating it back down, and a "max ts per left row" correlated subquery
  * re-scans the right side per row. This implementation is the scalable
  * union + ordered-window carry-forward:
  *
  *   1. tag right rows 0 and left rows 1, union them on (key, ts, payloads);
  *   2. one hash shuffle on `key`, sort within partition by (ts, side) —
  *      side 0 first makes the join INCLUSIVE (a right row at exactly
  *      left.ts is visible to it);
  *   3. `last(carry_struct, ignoreNulls)` over the running frame forwards
  *      the most recent right payload to every subsequent row;
  *   4. keep only left rows.
  *
  * Cost: ONE shuffle of |L|+|R| rows and a per-partition sort — the same
  * cost envelope as a sort-merge join, with no row amplification. At 100 TB
  * the shuffle is unavoidable (as-of needs per-key time order); what matters
  * is that nothing here is quadratic and no range explosion happens. A hot
  * key lands on one task — pre-salt with [[Skew]] and as-of per salt only if
  * the carried value is key-global (salting splits time order, so it is only
  * safe when each salt's matches are self-contained; documented, not
  * automatic).
  *
  * The right payload travels as ONE struct, not per-column `last()` calls:
  * this keeps the carried columns atomic (all from the same right row) and
  * stops a NULL in one carried column from "seeing through" to an older
  * right row.
  *
  * Right rows must be unique per (key, ts) — with duplicates, which row wins
  * is tie-ordering luck in ANY engine (DuckDB included); pre-aggregate to
  * make the choice explicit, as the query inventory does.
  */
object AsOf {

  /** @param left      left side; must contain `key` and `ts` columns
    * @param right     right side; must contain `key`, `ts`, and `carryCols`
    * @param key       equi-join key column name (same name both sides)
    * @param ts        event-time column name (same name both sides; any
    *                  orderable type — long µs, timestamp, date)
    * @param carryCols right columns to attach to each left row
    * @return left rows (all columns, original names) + `carryCols`, plus
    *         `<ts>_right` = the matched right row's ts (NULL when unmatched)
    */
  def joinAsOf(left: DataFrame, right: DataFrame, key: String, ts: String,
      carryCols: Seq[String]): DataFrame = {
    val payload = left.columns.filterNot(c => c == key || c == ts).toSeq
    val tsRight = s"${ts}_right"
    // fail fast: a carried name colliding with a left column would emit a
    // DataFrame with duplicate column names that only blows up (AMBIGUOUS_
    // REFERENCE) at the first downstream select
    val collisions = (carryCols :+ tsRight).filter(left.columns.contains)
    require(collisions.isEmpty,
      s"carryCols collide with left columns: ${collisions.mkString(", ")} — rename one side")

    // carried struct: right's ts + payload; NULL (not a struct of NULLs) on
    // left rows so ignoreNulls skips them
    val rightStruct = struct((col(ts).as(tsRight) +: carryCols.map(col)): _*)

    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__carry", lit(null).cast(
        right.select(rightStruct).schema.head.dataType))
    val r = payload.foldLeft(
      right.select(col(key), col(ts), rightStruct.as("__carry"))
        .withColumn("__side", lit(0))) { (d, c) =>
      d.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }

    val ordered = Seq(key, ts, "__side", "__carry") ++ payload
    val w = Window.partitionBy(key).orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = l.select(ordered.map(col): _*)
      .unionByName(r.select(ordered.map(col): _*))
      .withColumn("__carry", last(col("__carry"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)

    carried.select((Seq(key, ts) ++ payload).map(col) ++
      (tsRight +: carryCols).map(c => col(s"__carry.$c").as(c)): _*)
  }

  /** Bucketized interval join: points matched into `[start, end)` ranges,
    * optionally under equi-keys — the second temporal-join primitive next
    * to [[joinAsOf]].
    *
    * Spark plans a bare range predicate between two relations as a
    * broadcast-nested-loop (or cartesian) — O(|points|·|intervals|)
    * comparisons regardless of how few pairs match. The standard scalable
    * rewrite: quantize the range axis into width-`bucketWidth` buckets,
    * explode each interval over the buckets it touches
    * (span/bucketWidth + 1 copies — pick the width near the typical span
    * so amplification stays ~2×), hash-join points to interval-buckets on
    * (keys, bucket), then apply the EXACT range predicate to the bucket-
    * collision survivors. Same result, but now it is one equi-shuffle
    * whose output is |true matches| + the boundary slop, never a loop
    * join. When the two sides share one relation and an ordering, a RANGE
    * window frame is the cheaper form (q_range_window); this operator is
    * for the cross-relation case where no shared scan exists.
    *
    * Bucket ids use exact integer floor-division (`(c − pmod(c, w)) / w`,
    * products stay under 2^53 so the arithmetic is exact in the double
    * lane; correct for negative values too via pmod's floor semantics) —
    * a naive `floor(c / w)` in doubles can mis-bucket boundary values at
    * µs-epoch magnitudes. Empty intervals (`end <= start`) are dropped
    * (they can match nothing, and their bucket sequence would descend).
    *
    * @return inner-join rows: interval columns + point columns (equi-keys
    *         merged); caller aggregates / re-joins for outer semantics.
    */
  def intervalJoin(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      bucketWidth: Long, keyCols: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth ($bucketWidth) must be positive")
    val collisions = points.columns.toSet.intersect(intervals.columns.toSet)
      .diff(keyCols.toSet)
    require(collisions.isEmpty,
      s"non-key columns collide across sides: ${collisions.mkString(", ")}")
    def fdiv(c: Column): Column =
      ((c - pmod(c, lit(bucketWidth))) / bucketWidth).cast("long")
    val pb = points.withColumn("__bucket", fdiv(col(pointCol)))
    val ib = intervals
      .where(col(endCol) > col(startCol))
      .withColumn("__bucket",
        explode(sequence(fdiv(col(startCol)), fdiv(col(endCol) - 1))))
    ib.join(pb, keyCols :+ "__bucket")
      .where(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bucket")
  }
}
