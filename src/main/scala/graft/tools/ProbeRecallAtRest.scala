package graft.tools

import graft.Tables
import graft.operators.{Ivf, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only (r13, VERDICT r12 #7): measure recall@20 of the AT-REST IVF
  * index (train k=8 iters=2 + writeClustered — the declared IvfIndex
  * parameters) against brute-force truth at a given SF, for
  * nProbe ∈ {1,2,4,8}, over a deterministic spread of query vectors.
  * Records the sf1 operating point SCALE.md cites.
  *
  * Usage: runMain graft.tools.ProbeRecallAtRest [sfDir] [nQueries]
  */
object ProbeRecallAtRest {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/sf1")
    val nQueries = if (args.length > 1) args(1).toInt else 16
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.extensions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = Tables.load(spark, sfDir, "embeddings")
    val n = emb.count()
    println(s"[recall] corpus $sfDir: $n vectors")

    val path = java.nio.file.Files
      .createTempDirectory("graft_recall_atrest_").toString
    val model = Ivf.train(emb, "vec_id", "embedding", k = 8, iters = 2)
    Ivf.writeClustered(emb, "vec_id", "embedding", model, path)

    // deterministic query spread across the corpus (not just the head,
    // which can share a cluster); vec_ids are sparse at sf1, so stride
    // over the ORDERED ids, not the id range
    val allIds = emb.select("vec_id").orderBy("vec_id")
      .collect().map(_.getLong(0))
    val stride = math.max(1, allIds.length / nQueries)
    val qids = (0 until nQueries).map(i => allIds(i * stride))

    def ids(df: DataFrame): Set[Long] =
      df.select("vec_id").collect().map(_.getLong(0)).toSet

    val perProbe = scala.collection.mutable.Map[Int, Vector[Double]]()
    for (qid <- qids) {
      val qv = Similarity.vectorOf(spark, emb, "vec_id", "embedding", qid)
      val truth = ids(Similarity.bruteForceTopK(emb, "vec_id", "embedding", qv, 20))
      for (np <- Seq(1, 2, 4, 8)) {
        val got = ids(Ivf.probeClustered(spark, path, "vec_id", "embedding",
          qv, nProbe = np, k = 20))
        val r = (got & truth).size / 20.0
        perProbe(np) = perProbe.getOrElse(np, Vector.empty) :+ r
      }
    }
    for (np <- Seq(1, 2, 4, 8)) {
      val rs = perProbe(np)
      println(f"[recall] nProbe=$np recall@20 over ${rs.size} queries: " +
        f"min=${rs.min}%.3f mean=${rs.sum / rs.size}%.3f " +
        f"median=${rs.sorted.apply(rs.size / 2)}%.3f")
    }
    spark.stop()
  }
}
