package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{AnalyticsQueries, CoreQueries, ExtQueries, MediaQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The declared query inventory (SURVEY.md §2.12) lives in
  * [[graft.queries.CoreQueries]]; each entry carries its DuckDB oracle SQL
  * for the driver's differential-correctness gate.
  */
object SparkEntry {

  private def allDefs: Seq[QueryDef] = {
    val defs = CoreQueries.defs ++ ExtQueries.defs ++
      AnalyticsQueries.defs ++ MediaQueries.defs
    // a name collision would silently drop a QueryDef from the .toMap below
    // and shrink the driver's correctness gate without any error
    val dups = defs.groupBy(_.name).collect { case (n, ds) if ds.size > 1 => n }
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    defs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * q_agg_star = the reference's vw_energy_summary pattern
    * (load/__init__.py:143-163): dim-joined fact with count-distinct/sum/avg.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg_star")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.build).toMap

  /** Query names in DECLARATION order — Bench runs them in this order so
    * build-then-probe pairs (q_sim_ivf_build → q_sim_ivf) measure what they
    * claim, and per-round bench comparisons aren't scrambled by Map hashing.
    */
  def orderedQueryNames: Seq[String] = allDefs.map(_.name)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(o => d.name -> o)).toMap
}
