package graft.tools

import graft.Tables
import graft.operators.{Ivf, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only (r15, VERDICT r14 #4): measure recall@20 of the DEFAULT serve
  * path — `trainSized` (derived-√n k) + `writeClustered` +
  * `probeClusteredSized` (sidecar-derived nProbe) — against brute-force
  * truth at a given SF, over a deterministic spread of query vectors. This
  * is the end-to-end knob-free path a caller at unknown scale gets, and
  * the run that pins "the sf1 default serve path clears 0.9 mean recall"
  * in SCALE.md. Also prints the explicit fixture path (k=8, nProbe=4) for
  * the before/after delta.
  *
  * Usage: runMain graft.tools.ProbeRecallSized [sfDir] [nQueries]
  */
object ProbeRecallSized {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/scale/sf1")
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
    val dk = Ivf.derivedK(n)
    val dnp = Ivf.derivedNProbe(n, dk)
    println(s"[sized] corpus $sfDir: $n vectors, derived k=$dk nProbe=$dnp")

    val path = java.nio.file.Files
      .createTempDirectory("graft_recall_sized_").toString
    val model = Ivf.trainSized(emb, "vec_id", "embedding", iters = 2)
    require(model.k == dk, s"trainSized k=${model.k} != derivedK $dk")
    Ivf.writeClustered(emb, "vec_id", "embedding", model, path)

    val allIds = emb.select("vec_id").orderBy("vec_id")
      .collect().map(_.getLong(0))
    // a corpus smaller than nQueries clamps stride to 1 — cap the query
    // count at the corpus size so i*stride stays in bounds
    val nq = math.min(nQueries, allIds.length)
    val stride = math.max(1, allIds.length / nq)
    val qids = (0 until nq).map(i => allIds(i * stride))

    def ids(df: DataFrame): Set[Long] =
      df.select("vec_id").collect().map(_.getLong(0)).toSet

    var sized = Vector.empty[Double]
    var fixture = Vector.empty[Double]
    for (qid <- qids) {
      val qv = Similarity.vectorOf(spark, emb, "vec_id", "embedding", qid)
      val truth = ids(Similarity.bruteForceTopK(emb, "vec_id", "embedding", qv, 20))
      sized = sized :+ (ids(Ivf.probeClusteredSized(spark, path, "vec_id",
        "embedding", qv, k = 20)) & truth).size / 20.0
      fixture = fixture :+ (ids(Ivf.probeClustered(spark, path, "vec_id",
        "embedding", qv, nProbe = math.min(4, dk), k = 20)) & truth).size / 20.0
    }
    def line(label: String, rs: Vector[Double]): Unit =
      println(f"[sized] $label recall@20 over ${rs.size} queries: " +
        f"min=${rs.min}%.3f mean=${rs.sum / rs.size}%.3f " +
        f"median=${rs.sorted.apply(rs.size / 2)}%.3f")
    line(s"DEFAULT (sized: k=$dk, nProbe=$dnp)", sized)
    line(s"fixture knob (k=$dk, nProbe=4)", fixture)
    spark.stop()
  }
}
