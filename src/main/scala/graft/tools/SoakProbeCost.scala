package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.functions._

/** Dev-only (r14, VERDICT r13 #8): does the near-dup index's
  * "bucket-clustered row groups for min/max skipping on the probe" claim
  * actually engage, and on WHICH probe shape? Builds the gate's band index
  * at growing sizes in three at-rest layouts —
  *
  *   - `flat`: plain repartition(32) (no clustering at all);
  *   - `range`: repartitionByRange(32, band, bucket) — what
  *     [[graft.streaming.Streaming.compactNearDupIndex]] committed through
  *     r13 (FILE-level range disjointness; rows inside a file unsorted, so
  *     row-group stats ≈ the whole file's range);
  *   - `rangeSorted`: range + sortWithinPartitions(band, bucket) —
  *     row-group min/max become tight disjoint sub-ranges.
  *
  * — and measures two probe shapes against each layout and size:
  *
  *   1. SELECTIVE probe: one document's nBands (band, bucket) literals as
  *      a pushed OR-of-conjunctions predicate (the interactive "is this a
  *      dup" / small-batch incremental shape). Row-group skipping CAN
  *      engage here — scan rows should stay ~flat as the index grows on
  *      the clustered layouts and grow linearly on `flat`.
  *   2. STREAMING batch probe: a 25k-doc batch's bands semi-joined on
  *      (band, bucket) (the per-micro-batch gate shape). A batch's bucket
  *      keys are uniform over the hash space, so NO static predicate can
  *      skip anything — this measures the honest linear scan term and
  *      whether layout moves it at all.
  *
  * Metrics: the index-side FileSourceScanExec `numOutputRows` (rows
  * surviving row-group pruning — AQE is off in this tool so the executed
  * plan is a plain tree and the scan metric is directly addressable) and
  * median wall time of 3. Results feed SCALE.md; the claim gets corrected
  * to whatever this measures.
  *
  * Usage: runMain graft.tools.SoakProbeCost [maxDocs] [batchDocs]
  */
object SoakProbeCost {
  def main(args: Array[String]): Unit = {
    val maxDocs = if (args.length > 0) args(0).toInt else 1000000
    val batchDocs = if (args.length > 1) args(1).toInt else 25000
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // a storage-layout measurement, not a plan measurement: a plain
      // executed tree makes the scan node's metrics directly addressable
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("graft_probe_").toString
    println(s"[probecost] layouts under $root")

    // the SoakNearDupGate text generator's unique-doc channel: ~12 tokens,
    // unbounded vocabulary so no accidental dups
    def textOf(id: Long): String =
      (0 until 12).map(t => s"w${id * 31 + t * 7919}x$t").mkString(" ")
    def bandsOf(lo: Long, hi: Long): DataFrame =
      Dedup.minhashBandBuckets(
        spark.range(lo, hi).select(col("id").as("doc_id"))
          .as[Long].map(id => (id, textOf(id))).toDF("doc_id", "text")
          .select(col("doc_id"),
            graft.functions.TextFunctions.tokens(col("text")).as("toks")),
        shingleN = 3, nPerms = 32, nBands = 8)

    val sizes = Iterator.iterate(maxDocs)(_ / 2).takeWhile(_ >= maxDocs / 8)
      .toSeq.reverse
    val allBands = bandsOf(0, maxDocs).localCheckpoint()
    val probeBands = bandsOf(2000000000L, 2000000000L + batchDocs)
      .localCheckpoint()
    // the selective probe's keys: one indexed doc's band rows (literals)
    val probeDoc = allBands.where(col("doc_id") === 7L)
      .select("band", "bucket").collect()
      .map(r => (r.getInt(0), r.getLong(1)))

    def scanRows(df: DataFrame, pathFrag: String): Long = {
      // collect(), NOT a noop write: the write path builds its OWN
      // QueryExecution, leaving this df's plan unexecuted and its scan
      // metrics at zero (both probe shapes return few rows, so collect
      // is safe)
      df.collect()
      def scans(p: SparkPlan): Seq[FileSourceScanExec] =
        (p match {
          case s: FileSourceScanExec
            if s.relation.location.rootPaths.exists(_.toString.contains(pathFrag)) =>
            Seq(s)
          case _ => Seq.empty
        }) ++ p.children.flatMap(scans) ++ p.subqueries.flatMap(scans)
      val found = scans(df.queryExecution.executedPlan)
      require(found.nonEmpty, s"no index scan found for $pathFrag")
      found.map(_.metrics("numOutputRows").value).sum
    }
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def median3(f: => Double): Double =
      Seq.fill(3)(f).sorted.apply(1)

    println("layout\tdocs\tindex_rows\tsel_scan_rows\tsel_ms\tbatch_scan_rows\tbatch_sec")
    for (nd <- sizes) {
      val slice = allBands.where(col("doc_id") < nd)
      val nRows = slice.count()
      for ((layout, writer, blockBytes) <- Seq[(String, DataFrame => DataFrame, Long)](
        ("flat", _.repartition(32), 0L),
        ("range", _.repartitionByRange(32, col("band"), col("bucket")), 0L),
        ("rangeSorted", _.repartitionByRange(32, col("band"), col("bucket"))
          .sortWithinPartitions(col("band"), col("bucket")), 0L),
        // sorted AND written with small row groups: min/max skipping gets
        // sub-file granularity — the knob a selective-probe-optimized
        // index actually turns
        ("rangeSortedRG", _.repartitionByRange(32, col("band"), col("bucket"))
          .sortWithinPartitions(col("band"), col("bucket")), 256L << 10))) {
        val dir = s"$root/${layout}_$nd"
        val w = writer(slice).write.mode("overwrite")
        (if (blockBytes > 0)
          w.option("parquet.block.size", blockBytes)
            .option("parquet.page.size", 64 << 10)
         else w).parquet(dir)
        val idx = () => spark.read.parquet(dir)

        // 1. selective probe: pushed OR of this doc's 8 (band, bucket)s
        val pred = probeDoc.map { case (b, v) =>
          (col("band") === b) && (col("bucket") === v)
        }.reduce(_ || _)
        val selDf = idx().where(pred)
        val selRows = scanRows(selDf, dir)
        val selMs = median3 {
          val (_, t) = timed(idx().where(pred).write
            .format("noop").mode("overwrite").save()); t * 1000
        }

        // 2. streaming batch probe: the gate's semi join on (band, bucket)
        def batchProbe() = probeBands.join(
          idx().select(col("band"), col("bucket")), Seq("band", "bucket"),
          "left_semi")
        val bRows = scanRows(batchProbe(), dir)
        val bSec = median3 {
          val (_, t) = timed(batchProbe().write
            .format("noop").mode("overwrite").save()); t
        }
        println(f"$layout\t$nd\t$nRows\t$selRows\t$selMs%.1f\t$bRows\t$bSec%.2f")
      }
    }
    spark.stop()
  }
}
