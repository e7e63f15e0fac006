package graft.etl

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.functions._

class MaintenanceSpec extends SparkSpec {

  test("readEvolved merges evolving schemas; old files yield NULL for new columns") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_evolve_").toString
    // generation 1: (id, a) — generation 2 adds column b
    Seq((1L, "x"), (2L, "y")).toDF("id", "a")
      .coalesce(1).write.parquet(s"$dir/g=1")
    Seq((3L, "z", 30L), (4L, "w", 40L)).toDF("id", "a", "b")
      .coalesce(1).write.parquet(s"$dir/g=2")

    val merged = Maintenance.readEvolved(spark, dir)
    assert(merged.columns.toSet == Set("id", "a", "b", "g"))
    assert(merged.count() == 4)
    // old generation's missing column is NULL, not an error, not garbage
    assert(merged.where($"g" === 1 && $"b".isNull).count() == 2)
    assert(merged.where($"g" === 2).agg(sum($"b")).head().getLong(0) == 70L)
    // plain read (no mergeSchema) picks ONE footer — the guard readEvolved exists for
    assert(spark.read.parquet(dir).columns.toSet != merged.columns.toSet ||
      merged.columns.toSet.subsetOf(spark.read.parquet(dir).columns.toSet))
  }

  test("compact collapses a many-small-file table to the computed target count") {
    val dir = Files.createTempDirectory("graft_compact_in_").toString
    val out = Files.createTempDirectory("graft_compact_out_").toString
    val df = graft.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    df.repartition(40).write.mode("overwrite").parquet(dir)
    val before = new java.io.File(dir).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(before >= 30, s"fixture should start fragmented, had $before files")

    // target sized so everything fits one file
    val planned = Maintenance.compact(spark, dir, out, targetBytes = 1L << 30)
    val after = new java.io.File(out).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(planned == 1 && after == 1, s"expected 1 output file, got $after")
    // content preserved exactly
    val a = spark.read.parquet(dir); val b = spark.read.parquet(out)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("compact sizes from files under PARTITION subdirs (recursive listing)") {
    val dir = Files.createTempDirectory("graft_compact_part_").toString
    val out = Files.createTempDirectory("graft_compact_part_out_").toString
    val df = graft.Tables.load(spark, "/root/testdata/sf0.001", "orders")
    df.withColumn("pri", substring(col("o_orderpriority"), 1, 1))
      .repartition(8).write.partitionBy("pri").mode("overwrite").parquet(dir)
    // a flat (non-recursive) listing would see 0 bytes here and plan 1 file
    // from an EMPTY size estimate — the recursive walk must find the real
    // bytes and the rewrite must preserve every row
    val planned = Maintenance.compact(spark, dir, out, targetBytes = 8L * 1024)
    assert(planned > 1,
      "planned=1 means the recursive listing found zero bytes under the partition dirs")
    val a = spark.read.parquet(dir); val b = spark.read.parquet(out)
    assert(a.count() == b.count())
    assert(a.drop("pri").exceptAll(b.drop("pri")).isEmpty)
  }

  test("ANALYZE TABLE feeds the CBO measured stats (rowCount visible in catalog)") {
    val df = graft.Tables.load(spark, "/root/testdata/sf0.001", "region")
    // clear any stale managed-table location from a previous test run
    spark.sql("DROP TABLE IF EXISTS maint_region")
    val loc = new java.io.File("target/spark-warehouse/maint_region")
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(loc)
    }
    df.write.mode("overwrite").saveAsTable("maint_region")
    Maintenance.analyzeTable(spark, "maint_region", Seq("r_regionkey"))
    // catalog-level truth: ANALYZE recorded exact row count + column stats
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier("maint_region"))
    assert(meta.stats.exists(_.rowCount.exists(_.toLong == df.count())),
      s"expected analyzed rowCount in catalog, got ${meta.stats}")
    assert(meta.stats.exists(_.colStats.contains("r_regionkey")),
      "expected column stats for r_regionkey")
    // plan-level: with CBO on, the optimizer sees the measured rowCount
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val stats = spark.table("maint_region").queryExecution.optimizedPlan.stats
      assert(stats.rowCount.exists(_.toLong == df.count()),
        s"CBO should read the analyzed rowCount, got ${stats.rowCount}")
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
  }
}
