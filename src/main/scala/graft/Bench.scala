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
      // the PRODUCTION extension wiring: this is the first session of the
      // JVM, so the config string drives Spark's reflective applyExtensions
      // -> GraftExtensions.apply(injectFunction) — the injector path itself,
      // not the imperative register() fallback for pre-built sessions
      .config("spark.sql.extensions", "graft.extensions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: absorb one-time JVM/codegen/parquet-reader init so the
    // first timed query measures the query, not session bring-up.
    Tables.load(spark, sfDir, "lineitem").limit(1000)
      .groupBy("l_returnflag").count().count()
    def sweep(): Seq[(String, Double)] =
      // declaration order, not Map hash order: build-then-probe pairs
      // (q_sim_ivf_build → q_sim_ivf) must run build first, and per-round
      // comparisons shouldn't be scrambled by hashing
      SparkEntry.orderedQueryNames.map { name =>
        val fn = SparkEntry.queries(name)
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
    // Two full sweeps, keep the better time per query: a transient burst of
    // machine contention during one sweep (observed in round 2: untouched
    // queries "slowed" 2–6×, same code measured 38.5s on a quiet rerun of a
    // 74.0s artifact) cannot masquerade as a plan regression. A query that
    // failed in either sweep stays failed (-1): min() must not let one lucky
    // sweep hide flakiness.
    val s1 = sweep(); val s2 = sweep()
    val results = s1.zip(s2).map { case ((name, a), (_, b)) =>
      name -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }
    val qs = results.map { case (k, v) => JsonOut.quote(k) + ":" + v }
      .mkString("{", ",", "}")
    // failures are excluded from the headline (their -1 sentinel must not
    // SUBTRACT time and make a broken build look faster)
    val total = results.map(_._2).filter(_ >= 0).sum
    def sweepTotal(s: Seq[(String, Double)]) = s.map(_._2).filter(_ >= 0).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sweep_totals":[${sweepTotal(s1)},${sweepTotal(s2)}],"sf":${JsonOut.quote(sfDir)}}"""
    println(json)
    // Also self-record to a file: a stdout tail capture can truncate
    // mid-JSON (round 3's BENCH artifact lost its first 16 queries), and
    // this file is then the surviving full record. Best-effort — a
    // read-only target dir must not fail the bench itself.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench.json")
    try {
      val p = java.nio.file.Paths.get(outPath)
      Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.write(p, (json + "\n").getBytes("UTF-8"))
    } catch {
      case e: Exception =>
        System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    spark.stop()
  }
}
