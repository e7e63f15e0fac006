package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.extensions.GraftExtensions.register(spark)
    // Untimed warmup: absorb one-time JVM/codegen/parquet-reader init so the
    // first timed query measures the query, not session bring-up.
    Tables.load(spark, sfDir, "lineitem").limit(1000)
      .groupBy("l_returnflag").count().count()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        // noop sink, not count(): count() lets Catalyst prune projection-only
        // work, timing a select-heavy query as a bare row count
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
        }
      // a failed query must not masquerade as a fast one: record -1
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => JsonOut.quote(k) + ":" + v }
      .mkString("{", ",", "}")
    // failures are excluded from the headline (their -1 sentinel must not
    // SUBTRACT time and make a broken build look faster)
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":${JsonOut.quote(sfDir)}}""")
    spark.stop()
  }
}
