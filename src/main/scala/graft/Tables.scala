package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's TPC-H-ish testdata (TESTDATA.md / FIXTURES.md §B).
  *
  * One parquet file per table under `sfDir`. Schemas are fixed by the driver
  * generator (seed=42); we read them as-is — Catalyst gets the parquet footer
  * schema, so filters/projections push down to the scan.
  *
  * Scale design note: at 100 TB these would be partitioned/bucketed tables
  * behind a catalog, not single files; every consumer in this library goes
  * through this one indirection so the storage layout can change in one place.
  */
object Tables {
  val dims: Seq[String]  = Seq("region", "nation", "customer", "supplier", "part")
  val facts: Seq[String] = Seq("orders", "lineitem", "events")
  val ext: Seq[String]   = Seq("documents", "embeddings")
  val all: Seq[String]   = dims ++ facts ++ ext

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS) which Spark 4 rejects outright;
    // read it as a long (ns since epoch) and truncate to µs exactly like
    // DuckDB's CAST(ts_ns AS TIMESTAMP) so oracle comparisons agree.
    // The flag is session-wide and there is no per-read option for it, so it
    // is set unconditionally here — behavior must not depend on whether the
    // events table happened to be loaded first.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if (name == "events") {
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Register every table as a temp view so `spark.sql` works over them —
    * the Spark analogue of the reference's DuckDB table registration
    * (reference: src/etl/load/__init__.py:188-220).
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
