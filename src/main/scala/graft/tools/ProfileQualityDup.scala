package graft.tools

import graft.Tables
import graft.functions.TextFunctions
import graft.operators.{Components, Dedup}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler for q_quality_vs_dup's stages at a given SF (r13 sf10
  * shakeout): times the dup side (jaccardPairs, CC), the score side
  * (qualityScore scan, checkpoint + globalRowNumber ranking), and the full
  * declared query, each as a separate action, to localize over-threshold
  * growth.
  *
  * Usage: runMain graft.tools.ProfileQualityDup <sfDir> [repeats]
  */
object ProfileQualityDup {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val repeats = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.extensions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to repeats).map { _ =>
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[prof] $label runs ${ts.map(t => f"$t%.2f").mkString(", ")}")
    }

    val d = Tables.load(spark, sfDir, "documents")
    d.count() // warm the scan

    time("jaccard_pairs_count") {
      println("  pairs=" + Dedup.jaccardPairs(d, "doc_id", "text").count())
    }
    time("cc_components") {
      val comp = Components.connectedComponents(d.select("doc_id"), "doc_id",
        Dedup.jaccardPairs(d, "doc_id", "text"), "doc_a", "doc_b")
      println("  comps=" + comp.select("component").distinct().count())
    }
    time("quality_scan") {
      println("  scored=" + d.select(col("doc_id"),
        TextFunctions.qualityScore(col("text")).as("q"))
        .where(col("q").isNotNull).count())
    }
    time("rank_side") {
      val sc = d.select(col("doc_id"),
        TextFunctions.qualityScore(col("text")).as("q"))
      val nonNull = sc.where(col("q").isNotNull)
        .select(col("doc_id"), col("q")).localCheckpoint(true)
      val ranked = graft.operators.Rank.globalRowNumber(
        nonNull, Seq("q", "doc_id"), "rn")
      val nRow = nonNull.agg(count(lit(1)).as("n"))
      val th = ranked.crossJoin(broadcast(nRow))
        .where((1 to 9).map(i =>
          col("rn") === ceil(col("n") * lit(i / 10.0)).cast("long"))
          .reduce(_ || _))
        .agg(sort_array(collect_list(col("q"))).as("vs"))
      println("  th=" + th.collect().head.getSeq[Double](0).size)
      nonNull.unpersist(true)
    }
    spark.stop()
  }
}
