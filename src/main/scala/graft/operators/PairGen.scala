package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared within-group candidate-pair generation for the LSH-style operators
  * (MinHash bands, SimHash chunks, rare shingles, embedding buckets).
  */
private[operators] object PairGen {

  /** All (a,b) pairs (a<b by sort order) from a sorted array column, via
    * HOFs — stays in codegen, no self-join.
    */
  def pairArray(ids: Column): Column =
    flatten(transform(ids, (a, i) =>
      transform(slice(ids, i + lit(2), size(ids)), b =>
        struct(a.as("a"), b.as("b")))))

  /** Deterministic within-group pairs (columns `a`, `b`) for groups of size
    * in [2, maxGroup].
    *
    * Scale-safe shape: a count-first pass drops oversized groups BEFORE any
    * array materializes (a degenerate bucket can hold millions of members at
    * corpus scale — collecting it first would OOM the aggregation buffer),
    * then the surviving small groups collect, sort and pair via HOFs.
    * All three ops shuffle on the same keys, so AQE/exchange reuse keeps
    * this at ~one effective shuffle of the candidate rows.
    */
  def groupPairs(df: DataFrame, keys: Seq[String], payload: Column,
      maxGroup: Int): DataFrame = {
    val keyCols = keys.map(col)
    // the pruneGuard no-op keeps this count branch reading the SAME columns
    // as the pair branch below, so both consume one ReusedExchange instead
    // of re-running the upstream candidate pipeline (see Dedup.pruneGuard)
    val smallGroups = df.groupBy(keyCols: _*)
      .agg((count(lit(1)) + Dedup.pruneGuard(payload)).as("__gn"))
      .where(col("__gn") >= 2 && col("__gn") <= maxGroup)
      .select(keyCols: _*)
    df.join(smallGroups, keys)
      .groupBy(keyCols: _*)
      .agg(array_sort(collect_list(payload)).as("ids"))
      .select(explode(pairArray(col("ids"))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
  }
}
