package graft.tools

import graft.{SparkEntry, Tables}
import org.apache.spark.sql.SparkSession

/** Dev harness: time the named queries N times each at a given SF (same
  * noop-sink measurement as [[graft.Bench]]) and print per-run times + the
  * median. For settling single-query tripwire flags without paying a full
  * 3×190-query sweep. Accepts declared names AND the operator sub-timing
  * names from [[graft.queries.ExtQueries.operatorOnly]] — bare
  * (`q_stream_gate1`) or bench-suffixed (`q_stream_gate1_operator`) —
  * so twin flags can be settled too (VERDICT r10 #2).
  *
  * Usage: runMain graft.tools.TimeQueries <sfDir> <repeats> <q1> [q2 ...]
  */
object TimeQueries {

  private def resolve(name: String):
      (SparkSession, String) => org.apache.spark.sql.DataFrame = {
    val ops = graft.queries.ExtQueries.operatorOnly
    SparkEntry.queries.get(name)
      .orElse(ops.get(name))
      .orElse(ops.get(name.stripSuffix("_operator")))
      .getOrElse(sys.error(s"unknown query: $name (not declared, not an " +
        "operatorOnly sub-timing)"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val repeats = args(1).toInt
    // args containing '=' are session conf overrides (dev knob, mirrors
    // ExplainPrep); the rest are query names
    val (confs, names) = args.drop(2).toSeq.partition(_.contains("="))
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.extensions.GraftExtensions")
    confs.foreach { kv =>
      val Array(k, v) = kv.split("=", 2); builder.config(k, v)
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.load(spark, sfDir, "lineitem").limit(1000)
      .groupBy("l_returnflag").count().count() // warmup
    names.foreach { name =>
      val fn = resolve(name)
      val ts = (1 to repeats).map { _ =>
        // Release the PREVIOUS run's leftover storage blocks before timing:
        // queries that localCheckpoint internally (CC, pagerank, rank cuts)
        // leave their blocks pinned until the driver GCs the RDD handles,
        // and ContextCleaner's periodic GC defaults to 30 min — an sf10
        // ladder accumulated ten heavy queries' checkpoints and died with
        // executor OOM mid-query (r13). Cleanup runs OUTSIDE the timed
        // window; each query is measured from a clean block manager.
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val med = ts.sorted.apply(ts.size / 2)
      println(f"[time] $name median $med%.3f s runs ${ts.map(t => f"$t%.3f").mkString(", ")}")
    }
  }
}
