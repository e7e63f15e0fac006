package graft.tools

import graft.Tables
import graft.operators.{Components, Dedup, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: attribute the connected-components loop's cost inside the
  * cluster-family queries (r16 optimization round): pair machinery alone,
  * the CC loop alone (with round count), and the per-stage split of
  * shinglePairs — so a round-cost change is measured against the right
  * denominator.
  *
  * Usage: runMain graft.tools.ProfileCC [sfDir] [repeats]
  */
object ProfileCC {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val repeats = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.extensions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def cleanup(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to repeats).map { _ =>
        cleanup()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[profcc] $name: median ${ts.sorted.apply(ts.size / 2)}%.3f s " +
        s"runs ${ts.map(t => f"$t%.3f").mkString(", ")}")
    }
    val docs = Tables.load(spark, sfDir, "documents")
    docs.count() // warm

    // --- shinglePairs stage split ---
    import graft.functions.TextFunctions._
    val byDoc = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        arrayBarrier(array_distinct(shinglesFromTokens(col("toks"), 3))).as("shs"))
      .select(col("doc_id"), col("shs"), explode(col("shs")).as("shingle"))
      .select(col("doc_id"), size(col("shs")).as("n"), col("shingle"))
    time("explode only (map)")(
      byDoc.write.format("noop").mode("overwrite").save())
    time("explode+repartition(shingle)")(
      byDoc.repartition(col("shingle"))
        .write.format("noop").mode("overwrite").save())
    time("shinglePairs full")(
      Dedup.shinglePairs(docs, "doc_id", "text")
        .write.format("noop").mode("overwrite").save())
    time("jaccardPairs full")(
      Dedup.jaccardPairs(docs, "doc_id", "text")
        .write.format("noop").mode("overwrite").save())

    // --- CC loop on the jaccard graph ---
    locally {
      cleanup()
      val t0 = System.nanoTime()
      val (c, rounds) = Components.connectedComponentsWithRounds(
        docs.select("doc_id"), "doc_id",
        Dedup.jaccardPairs(docs, "doc_id", "text"), "doc_a", "doc_b")
      c.write.format("noop").mode("overwrite").save()
      println(f"[profcc] cc(jaccard) rounds=$rounds total ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    time("cc(jaccard) full")(
      Components.connectedComponents(docs.select("doc_id"), "doc_id",
          Dedup.jaccardPairs(docs, "doc_id", "text"), "doc_a", "doc_b")
        .write.format("noop").mode("overwrite").save())

    // --- CC on the embedding LSH graph (q_sim_clusters_x1 shape) ---
    val emb = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    emb.count()
    locally {
      cleanup()
      val pairs = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
        dims = 64, nPlanes = 4, minSim = 0.4, nTables = 8)
      val t0 = System.nanoTime()
      val (c, rounds) = Components.connectedComponentsWithRounds(
        emb.select(col("vec_id")), "vec_id", pairs, "id_a", "id_b")
      c.write.format("noop").mode("overwrite").save()
      println(f"[profcc] cc(lsh) rounds=$rounds total ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    time("lsh pairs alone")(
      Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
          dims = 64, nPlanes = 4, minSim = 0.4, nTables = 8)
        .write.format("noop").mode("overwrite").save())
    time("simclusters_x1 full")(
      Components.connectedComponents(emb.select(col("vec_id")), "vec_id",
          Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
            dims = 64, nPlanes = 4, minSim = 0.4, nTables = 8),
          "id_a", "id_b")
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
