package graft.tools

import graft.{SparkEntry, Tables}
import graft.operators.{Components, Dedup}
import graft.functions.TextFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only: attribute q_dedup_canonical's cost vs q_dedup_clusters
  * (VERDICT r6 item 3 — canonical medianed 96.5s vs clusters 9.2s).
  */
object ProfileCanonical {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.load(spark, sfDir, "documents")
    docs.count()

    time("jaccardPairs count") {
      Dedup.jaccardPairs(docs, "doc_id", "text").count()
    }
    time("clusters full") {
      SparkEntry.queries("q_dedup_clusters")(spark, sfDir).count()
    }
    time("canonical full") {
      SparkEntry.queries("q_dedup_canonical")(spark, sfDir).count()
    }
    // decomposition of canonical
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text")
    val comp = time("cc alone") {
      val c = Components.connectedComponents(docs.select("doc_id"), "doc_id",
        pairs, "doc_a", "doc_b")
      c.count(); c
    }
    val scored = docs.select(col("doc_id"),
      TextFunctions.qualityScore(col("text")).as("quality"))
    time("scored alone")(scored.count())
    val w = Window.partitionBy(col("component"))
      .orderBy(col("quality").desc, col("doc_id"))
    time("join+window on prebuilt comp") {
      comp.join(scored, "doc_id")
        .withColumn("rep_id", first(col("doc_id")).over(w))
        .count()
    }
    spark.stop()
  }
}
