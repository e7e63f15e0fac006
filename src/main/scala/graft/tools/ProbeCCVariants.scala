package graft.tools

import graft.Tables
import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only experiment harness (r16 optimization round): time variants of
  * the connected-components round body against the committed
  * [[graft.operators.Components]] loop on the two bench graph shapes
  * (jaccard pair graph, LSH embedding graph), and verify label equality.
  *
  * Variants:
  *   base  — committed loop (largeStar with distinct, smallStar, checksum)
  *   nodis — largeStar WITHOUT the trailing distinct (smallStar's final
  *           distinct dedups; intermediate volume bounded by |und|)
  *
  * Usage: runMain graft.tools.ProbeCCVariants [sfDir] [repeats]
  */
object ProbeCCVariants {

  private def checksum(df: DataFrame): (Long, BigDecimal) = {
    val r = df.agg(count(lit(1)),
      sum(xxhash64(col("a"), col("b")).cast("decimal(20,0)"))).head()
    (r.getLong(0),
      if (r.isNullAt(1)) BigDecimal(0) else BigDecimal(r.getDecimal(1)))
  }

  private def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(blocking = false))

  private def largeStar(e: DataFrame, dedup: Boolean): DataFrame = {
    val und = e.union(e.select(col("b").as("a"), col("a").as("b")))
    val m = und.groupBy(col("a"))
      .agg(least(col("a"), min(col("b"))).as("mn"))
    val out = und.join(m, "a")
      .where(col("b") > col("a"))
      .select(col("b").as("a"), col("mn").as("b"))
    if (dedup) out.distinct() else out
  }

  private def smallStar(e: DataFrame): DataFrame = {
    val m = e.groupBy(col("a")).agg(min(col("b")).as("mn"))
    val nbrs = e.join(m, "a")
      .where(col("b") =!= col("mn"))
      .select(col("b").as("a"), col("mn").as("b"))
    val self = m.select(col("a"), col("mn").as("b"))
    nbrs.union(self).distinct()
  }

  def ccVariant(nodes: DataFrame, idCol: String, edges: DataFrame,
      srcCol: String, dstCol: String, lsDedup: Boolean,
      maxIter: Int = 20, verbose: Boolean = false): (DataFrame, Int) = {
    val universe = nodes.select(col(idCol).cast("long").as("n")).distinct()
    var e = edges.select(col(srcCol).cast("long").as("a"),
        col(dstCol).cast("long").as("b"))
      .where(col("a") =!= col("b"))
      .join(universe.select(col("n").as("a")), Seq("a"), "left_semi")
      .join(universe.select(col("n").as("b")), Seq("b"), "left_semi")
      .select(col("a"), col("b"))
      .localCheckpoint(false)
    val tInit = System.nanoTime()
    var prev = checksum(e)
    if (verbose)
      println(f"[ccvar]   init+checksum ${(System.nanoTime() - tInit) / 1e9}%.3f s (|E|=${prev._1})")
    var round = 0
    var converged = prev._1 == 0L
    while (round < maxIter && !converged) {
      val t0 = System.nanoTime()
      val next = smallStar(largeStar(e, lsDedup)).localCheckpoint(false)
      val s = checksum(next)
      releaseCheckpoint(e)
      converged = s == prev
      prev = s
      e = next
      round += 1
      if (verbose)
        println(f"[ccvar]   round $round ${(System.nanoTime() - t0) / 1e9}%.3f s (|E|=${s._1})")
    }
    val parents = e.groupBy(col("a").as("n")).agg(min(col("b")).as("pcomp"))
    val labels = universe
      .join(parents, Seq("n"), "left")
      .select(col("n").as(idCol),
        coalesce(col("pcomp"), col("n")).as("component"))
    (labels, round)
  }

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
      println(f"[ccvar] $name: median ${ts.sorted.apply(ts.size / 2)}%.3f s " +
        s"runs ${ts.map(t => f"$t%.3f").mkString(", ")}")
    }
    val docs = Tables.load(spark, sfDir, "documents")
    docs.count()
    val emb = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    emb.count()

    def jacEdges() = Dedup.jaccardPairs(docs, "doc_id", "text")
    def lshEdges() = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
      dims = 64, nPlanes = 4, minSim = 0.4, nTables = 8)

    // label-equality check first (one run each, against the committed impl)
    locally {
      cleanup()
      val base = graft.operators.Components.connectedComponents(
        docs.select("doc_id"), "doc_id", jacEdges(), "doc_a", "doc_b")
      val v = ccVariant(docs.select("doc_id"), "doc_id", jacEdges(),
        "doc_a", "doc_b", lsDedup = false)._1
      val diff = base.withColumnRenamed("component", "c0")
        .join(v.withColumnRenamed("component", "c1"), Seq("doc_id"))
        .where(col("c0") =!= col("c1")).count()
      println(s"[ccvar] jaccard nodis label diff rows: $diff")
    }
    locally {
      cleanup()
      val base = graft.operators.Components.connectedComponents(
        emb.select("vec_id"), "vec_id", lshEdges(), "id_a", "id_b")
      val v = ccVariant(emb.select("vec_id"), "vec_id", lshEdges(),
        "id_a", "id_b", lsDedup = false)._1
      val diff = base.withColumnRenamed("component", "c0")
        .join(v.withColumnRenamed("component", "c1"), Seq("vec_id"))
        .where(col("c0") =!= col("c1")).count()
      println(s"[ccvar] lsh nodis label diff rows: $diff")
    }

    // verbose per-round split, one run each
    locally {
      cleanup()
      println("[ccvar] verbose jaccard base:")
      ccVariant(docs.select("doc_id"), "doc_id", jacEdges(), "doc_a", "doc_b",
        lsDedup = true, verbose = true)._1
        .write.format("noop").mode("overwrite").save()
    }
    locally {
      cleanup()
      println("[ccvar] verbose lsh base:")
      ccVariant(emb.select("vec_id"), "vec_id", lshEdges(), "id_a", "id_b",
        lsDedup = true, verbose = true)._1
        .write.format("noop").mode("overwrite").save()
    }

    time("jaccard base")(
      ccVariant(docs.select("doc_id"), "doc_id", jacEdges(), "doc_a", "doc_b",
        lsDedup = true)._1.write.format("noop").mode("overwrite").save())
    time("jaccard nodis")(
      ccVariant(docs.select("doc_id"), "doc_id", jacEdges(), "doc_a", "doc_b",
        lsDedup = false)._1.write.format("noop").mode("overwrite").save())
    time("lsh base")(
      ccVariant(emb.select("vec_id"), "vec_id", lshEdges(), "id_a", "id_b",
        lsDedup = true)._1.write.format("noop").mode("overwrite").save())
    time("lsh nodis")(
      ccVariant(emb.select("vec_id"), "vec_id", lshEdges(), "id_a", "id_b",
        lsDedup = false)._1.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
