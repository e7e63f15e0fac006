package graft.tools

import graft.etl.Maintenance
import graft.streaming.Streaming
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only volume soak of the exactly-once streaming near-dup gate (r13,
  * VERDICT r12 #6): StreamingSpec proves the gate's semantics on toy
  * micro-batches; this drives the SAME per-batch path
  * ([[Streaming.applyNearDedupBatch]] — banding, index probe, admission,
  * manifest-committed index append) through ~10⁶ documents in dozens of
  * batches and records what a long-running gate actually does:
  *
  *   - per-batch wall time as the at-rest index grows (the probe joins the
  *     full manifested index every batch — the curve must flatten to
  *     linear-in-index-size, not blow up);
  *   - index file growth between compactions and the effect of each
  *     [[Streaming.compactNearDupIndex]] (file count collapses to the
  *     target, admitted-doc count unchanged);
  *   - steady-state drop accounting: ~10% of each batch duplicates the
  *     previous batch (must be caught by the INDEX, the cross-batch path)
  *     and ~6% duplicates an earlier doc in the same batch (the
  *     within-batch path).
  *
  * Usage: runMain graft.tools.SoakNearDupGate [nBatches] [docsPerBatch]
  *        [compactEvery]
  */
object SoakNearDupGate {
  def main(args: Array[String]): Unit = {
    val nBatches = if (args.length > 0) args(0).toInt else 40
    val dpb = if (args.length > 1) args(1).toInt else 25000
    val compactEvery = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.sql.extensions", "graft.extensions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("graft_soak_").toString
    val indexDir = s"$root/index"
    val outDir = s"$root/out"
    println(s"[soak] $nBatches batches x $dpb docs -> $root")

    /** Deterministic ~12-token text; (b, j) unique except the two dup
      * channels: j%10==0 docs carry batch b−1's text for the same j
      * (inductively batch 0's — the steady-state INDEX-collision channel),
      * and j%17==1 docs copy the in-batch doc j−1 (the within-batch
      * channel).
      */
    def textOf(b: Int, j: Int): String = {
      val eb = if (j % 10 == 0) 0 else b
      val ej = if (j % 17 == 1 && j > 0) j - 1 else j
      val seed = eb.toLong * dpb + ej
      // no modulus on the token id: a bounded vocabulary makes seeds
      // collide across batches (seed*31 mod 10^5 repeats every 4 batches
      // of 25k) and the whole steady-state stream degenerates to replicas
      (0 until 12).map(t => s"w${seed * 31 + t * 7919}x$t").mkString(" ")
    }

    var tsFirst = Vector[Double]()
    var tsLast = Vector[Double]()
    for (b <- 0 until nBatches) {
      val batch = spark.range(b.toLong * dpb, (b + 1).toLong * dpb)
        .select(col("id").as("doc_id"))
        .as[Long].map(id => (id, textOf((id / dpb).toInt, (id % dpb).toInt)))
        .toDF("doc_id", "text")
      val t0 = System.nanoTime()
      Streaming.applyNearDedupBatch(batch, "doc_id", "text", indexDir,
        outDir, shingleN = 3, nPerms = 32, nBands = 8, batchId = b.toLong)
      val secs = (System.nanoTime() - t0) / 1e9
      if (b < 5) tsFirst :+= secs
      if (b >= nBatches - 5) tsLast :+= secs
      val files = Maintenance.manifestFileCount(spark, indexDir)
      val kept = spark.read.parquet(outDir)
        .where(col("ingest_batch") === b).count()
      println(f"[soak] batch $b%3d: $secs%6.2f s kept=$kept%6d " +
        f"dropped=${dpb - kept}%5d indexFiles=$files%4d")
      if ((b + 1) % compactEvery == 0) {
        val t1 = System.nanoTime()
        val (before, after) = Streaming.compactNearDupIndex(spark, indexDir)
        println(f"[soak] compaction after batch $b: files $before -> $after " +
          f"in ${(System.nanoTime() - t1) / 1e9}%.2f s")
        // Selective-probe scan rows against the REAL at-rest index (r15,
        // VERDICT r14 #6): r14 measured the flat row-group-skip curve on
        // SYNTHETIC indexes offline (SoakProbeCost); this measures it on
        // the soak's own compacted index as it grows. One indexed doc's 8
        // (band, bucket) literals pushed; AQE off around the probe so the
        // scan node's numOutputRows (rows surviving row-group pruning) is
        // directly addressable on a plain plan tree.
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try {
          val atRest = Maintenance.readManifested(spark, indexDir)
          val keys = atRest.where(col("doc_id") === 7L)
            .select("band", "bucket").collect()
            .map(r => (r.getInt(0), r.getLong(1)))
          if (keys.nonEmpty) {
            val pred = keys.map { case (bb, vv) =>
              (col("band") === bb) && (col("bucket") === vv)
            }.reduce(_ || _)
            val probe = Maintenance.readManifested(spark, indexDir)
              .where(pred).select("doc_id", "band", "bucket")
            val t2 = System.nanoTime()
            probe.collect()
            val ms = (System.nanoTime() - t2) / 1e6
            def scans(p: org.apache.spark.sql.execution.SparkPlan)
                : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
              (p match {
                case s: org.apache.spark.sql.execution.FileSourceScanExec
                  if s.relation.location.rootPaths
                    .exists(_.toString.contains(indexDir)) => Seq(s)
                case _ => Seq.empty
              }) ++ p.children.flatMap(scans) ++ p.subqueries.flatMap(scans)
            val found = scans(probe.queryExecution.executedPlan)
            require(found.nonEmpty, "no index scan in the probe plan")
            val scanned = found.map(_.metrics("numOutputRows").value).sum
            val idxRows = Maintenance.readManifested(spark, indexDir).count()
            println(f"[soak] selective probe after compaction: index_rows=" +
              f"$idxRows%9d scan_rows=$scanned%8d wall=$ms%7.1f ms")
          }
        } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
      }
    }
    val total = spark.read.parquet(outDir).count()
    val idx = Maintenance.readManifested(spark, indexDir)
    println(f"[soak] admitted total=$total of ${nBatches.toLong * dpb} " +
      f"(index rows=${idx.count()}, files=${Maintenance.manifestFileCount(spark, indexDir)})")
    println(f"[soak] mean batch secs: first5=${tsFirst.sum / tsFirst.size}%.2f " +
      f"last5=${tsLast.sum / tsLast.size}%.2f")
    spark.stop()
  }
}
