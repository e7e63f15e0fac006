package graft.tools

import graft.Tables
import graft.functions.TextFunctions._
import graft.functions.VectorNative.cosine
import graft.operators.{Dedup, Ivf, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: measure approximate-operator recall against exact truth at a
  * given scale factor, to pick safe property-oracle gates.
  */
object ProbeRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = Tables.load(spark, sfDir, "documents")
    val emb = Tables.load(spark, sfDir, "embeddings")
    docs.count(); emb.count()

    // exact all-pairs jaccard truth (no df cap)
    val ex = docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        arrayBarrier(array_distinct(shinglesFromTokens(col("toks"), 3))).as("shs"))
      .select(col("doc_id"), size(col("shs")).as("n"), explode(col("shs")).as("shingle"))
    val truthJ = ex.as("x").join(ex.as("y"),
        col("x.shingle") === col("y.shingle") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.n").as("n_a"), col("y.n").as("n_b"))
      .agg(count(lit(1)).as("n_inter"))
      .withColumn("jaccard", col("n_inter").cast("double") /
        (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
      .where(col("jaccard") >= 0.3)
      .select("doc_a", "doc_b", "jaccard")
    val tj = time("jaccard truth")(truthJ.cache().count())
    println(s"[probe] jaccard truth pairs: $tj")
    truthJ.orderBy("jaccard").show(10)
    println("[probe] jaccard distribution:")
    truthJ.select(min("jaccard"), expr("percentile(jaccard, 0.1)"), max("jaccard")).show()

    def pairRecall(name: String, found: DataFrame): Unit = {
      val f = found.select(col("doc_a"), col("doc_b"))
      val hit = time(s"$name recall join")(
        truthJ.join(f, Seq("doc_a", "doc_b")).count())
      println(f"[probe] $name: found=${f.count()} hits=$hit truth=$tj recall=${hit.toDouble / tj}%.3f")
    }
    pairRecall("minhash", Dedup.minhashPairs(docs, "doc_id", "text"))
    pairRecall("simhash", Dedup.simhashPairs(docs, "doc_id", "text"))

    // exact cosine all-pairs truth
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    val truthC = a.crossJoin(b).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("va"), col("vb")).as("cosine_sim"))
      .where(col("cosine_sim") >= 0.2)
    val tc = time("cosine truth")(truthC.cache().count())
    println(s"[probe] cosine truth pairs: $tc")
    val nd = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
      dims = 64, nPlanes = 4, minSim = 0.2, nTables = 8)
    val ndHit = time("neardup recall join")(
      truthC.join(nd, Seq("id_a", "id_b")).count())
    println(f"[probe] neardup: found=${nd.count()} hits=$ndHit truth=$tc recall=${ndHit.toDouble / tc}%.3f")

    // LSH / IVF top-20 recall
    val q = Similarity.vectorOf(spark, emb, "vec_id", "embedding", 0L)
    def ids(df: DataFrame): Set[Long] =
      df.select("vec_id").collect().map(_.getLong(0)).toSet
    val brute = ids(Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 20))
    val lsh = ids(Similarity.lshTopK(emb, "vec_id", "embedding", q,
      dims = 64, nPlanes = 4, k = 20, nTables = 8))
    println(f"[probe] lsh recall@20 = ${(lsh & brute).size / 20.0}%.3f")
    val model = Ivf.train(emb, "vec_id", "embedding", k = 8, iters = 2)
    for (np <- 1 to 6) {
      val ivf = ids(Ivf.topK(emb, "vec_id", "embedding", model, q, nProbe = np, k = 20))
      println(f"[probe] ivf recall@20 nProbe=$np = ${(ivf & brute).size / 20.0}%.3f")
    }
    // worst-case over several query vectors at the gate-candidate nProbe=4
    val qids = emb.select("vec_id").orderBy("vec_id").limit(8)
      .collect().map(_.getLong(0))
    val worst = qids.map { qid =>
      val qv = Similarity.vectorOf(spark, emb, "vec_id", "embedding", qid)
      val bt = ids(Similarity.bruteForceTopK(emb, "vec_id", "embedding", qv, 20))
      val iv = ids(Ivf.topK(emb, "vec_id", "embedding", model, qv, nProbe = 4, k = 20))
      (iv & bt).size / 20.0
    }
    println(f"[probe] ivf nProbe=4 recall over ${qids.length} queries: " +
      f"min=${worst.min}%.3f mean=${worst.sum / worst.length}%.3f")

    // derived-k sizing (VERDICT r13 #5): the same multi-query recall under
    // Ivf.derivedK instead of the fixture constant — run at sf1 AND sf10
    // to pin the sizing rule's recall at two decades (SCALE.md)
    val nEmb = emb.count()
    val dk = Ivf.derivedK(nEmb)
    val dModel = Ivf.train(emb, "vec_id", "embedding", k = dk, iters = 2)
    val dWorst = qids.map { qid =>
      val qv = Similarity.vectorOf(spark, emb, "vec_id", "embedding", qid)
      val bt = ids(Similarity.bruteForceTopK(emb, "vec_id", "embedding", qv, 20))
      val iv = ids(Ivf.topK(emb, "vec_id", "embedding", dModel, qv, nProbe = 4, k = 20))
      (iv & bt).size / 20.0
    }
    println(f"[probe] ivf DERIVED k=$dk (n=$nEmb) nProbe=4 recall over " +
      f"${qids.length} queries: min=${dWorst.min}%.3f mean=${dWorst.sum / dWorst.length}%.3f")

    spark.stop()
  }
}
