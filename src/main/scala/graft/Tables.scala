package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
    // events.ts encoding has varied across testdata generations:
    // TIMESTAMP(NANOS) (which Spark 4 rejects unless read as a long) and
    // plain timestamp[us] (read as TIMESTAMP_NTZ). Normalize BOTH to a
    // µs-precision instant TimestampType so every downstream query and the
    // DuckDB oracle (CAST(ts AS TIMESTAMP)) agree regardless of generation.
    // The nanosAsLong flag is session-wide with no per-read option, so it is
    // set unconditionally — behavior must not depend on load order.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if (name == "events") {
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      df.schema("ts").dataType match {
        // ns-as-long: truncate to µs exactly like DuckDB CAST(ns AS TIMESTAMP)
        case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        // µs wall-clock: session tz is UTC, so NTZ → instant is exact
        case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
        case TimestampType    => df
        case other =>
          throw new IllegalStateException(s"events.ts: unsupported parquet type $other")
      }
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Register every table as a temp view so `spark.sql` works over them —
    * the Spark analogue of the reference's DuckDB table registration
    * (reference: src/etl/load/__init__.py:188-220).
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
