package graft.tools

import graft.Tables
import graft.operators.{Ivf, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev-only (r14, VERDICT r13 #5): IVF recall@20 at nProbe=4 under the
  * fixture constant k=8 AND the [[Ivf.derivedK]] sizing, over 16 query
  * vectors strided across the ordered corpus — the sizing rule's recall
  * pinned at two scales for SCALE.md. Unlike ProbeRecall this carries NO
  * all-pairs truth legs (those are quadratic and exist only for the small
  * fixture), so it runs at sf1/sf10: per-query brute-force top-20 is the
  * only truth needed and is linear in n.
  *
  * Usage: runMain graft.tools.ProbeRecallDerived <sfDir> [iters] [nProbe]
  */
object ProbeRecallDerived {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val iters = if (args.length > 1) args(1).toInt else 2
    val nProbe = if (args.length > 2) args(2).toInt else 4
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = Tables.load(spark, sfDir, "embeddings")
      .localCheckpoint() // freeze: four training passes + 32 probes read it
    val n = emb.count()
    val qids = emb.select("vec_id").orderBy("vec_id")
      .collect().map(_.getLong(0))
      .grouped(math.max(1, (n / 16).toInt)).map(_.head).take(16).toSeq
    def ids(df: DataFrame): Set[Long] =
      df.select("vec_id").collect().map(_.getLong(0)).toSet
    val brute: Map[Long, Set[Long]] = qids.map { qid =>
      val qv = Similarity.vectorOf(spark, emb, "vec_id", "embedding", qid)
      qid -> ids(Similarity.bruteForceTopK(emb, "vec_id", "embedding", qv, 20))
    }.toMap

    for ((label, k) <- Seq("fixture" -> 8, "derived" -> Ivf.derivedK(n))) {
      val model = Ivf.train(emb, "vec_id", "embedding", k = k, iters = iters)
      val rec = qids.map { qid =>
        val qv = Similarity.vectorOf(spark, emb, "vec_id", "embedding", qid)
        val iv = ids(Ivf.topK(emb, "vec_id", "embedding", model, qv,
          nProbe = nProbe, k = 20))
        (iv & brute(qid)).size / 20.0
      }
      println(f"[recall] $label k=$k iters=$iters n=$n nProbe=$nProbe over " +
        f"${qids.size} queries: min=${rec.min}%.3f mean=${rec.sum / rec.size}%.3f")
    }
    spark.stop()
  }
}
