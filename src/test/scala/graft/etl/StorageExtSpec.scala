package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gates for the r9 storage extensions: the ORC tier (round-trip +
  * scan-level pushdown) and schema-evolution parquet reads (new columns
  * surface as NULLs across generations; type conflicts fail loudly).
  */
class StorageExtSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_storage_ext")
      .toFile.getAbsolutePath

  test("ORC round-trips and pushes predicates to the scan") {
    val dir = tmp() + "/t_orc"
    val df = Seq((1L, "alpha", 10.0), (2L, "beta", 20.0), (3L, "gamma", 30.0))
      .toDF("id", "name", "v")
    Load.writeOrc(df, dir)
    val back = Load.readOrc(spark, dir)
    // file reads are always nullable; names + types are the contract
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.orderBy("id").collect().toSeq ==
      df.orderBy("id").collect().toSeq)

    // predicate + projection reach the ORC scan like the parquet tiers
    val q = back.where($"id" > 1).select($"name")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan"),
      s"expected pushed filter in ORC scan:\n$plan")
    assert(q.collect().map(_.getString(0)).sorted.toSeq == Seq("beta", "gamma"))
  }

  test("readEvolved (multi-path) unions generations; plain read can drop the " +
    "new column; type conflicts fail loudly") {
    val v1 = tmp() + "/v1"
    val v2 = tmp() + "/v2"
    Seq((1L, "a")).toDF("id", "txt").write.parquet(v1)
    Seq((2L, "b", "en")).toDF("id", "txt", "lang").write.parquet(v2)

    val merged = Maintenance.readEvolved(spark, Seq(v1, v2))
    assert(merged.columns.toSet == Set("id", "txt", "lang"))
    val rows = merged.orderBy("id")
      .collect().map(r => (r.getLong(0), r.isNullAt(2))).toSeq
    assert(rows == Seq((1L, true), (2L, false)),
      "old-generation rows must surface the new column as NULL")

    // pushdown on a common column still reaches both files' scans
    val plan = merged.where($"id" > 1).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan"))

    // same column, different type across generations → loud failure, not
    // silent coercion (the corpus-maintenance contract)
    val v3 = tmp() + "/v3"
    Seq((3L, 42)).toDF("id", "txt").write.parquet(v3)
    val err = intercept[Exception] {
      Maintenance.readEvolved(spark, Seq(v1, v3)).collect()
    }
    assert(err.getMessage != null)
  }
}
