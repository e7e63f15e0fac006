package graft.tools

import graft.Tables
import graft.operators.{Corpus, Dedup}
import graft.functions.TextFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness (r13, VERDICT r12 #4): stage-level timing of the
  * q_corpus_clean funnel at an arbitrary SF, to locate where the ×5.2
  * sf1 growth actually goes before touching the oracled plan.
  *
  * Usage: runMain graft.tools.ProfileCorpusClean [sfDir] [repeats]
  */
object ProfileCorpusClean {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/sf1"
    val repeats = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.extensions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = Tables.load(spark, sfDir, "documents")
    d.count() // warmup + footer cache

    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to repeats).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[prof] $name median ${ts.sorted.apply(ts.size / 2)}%.2f s " +
        s"runs ${ts.map(t => f"$t%.2f").mkString(", ")}")
    }

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // stage A: the full declared query
    time("full funnel (declared)") {
      noop(Corpus.funnel(Corpus.clean(d, "doc_id", "text", minQuality = 0.2,
        keepLangs = Set("en", "es", "de"), portableHash = true)))
    }
    // stage B: quality+lang map pass alone
    time("quality+lang scan") {
      noop(d.select(col("doc_id"),
        TextFunctions.qualityScore(col("text")).as("q"),
        TextFunctions.predictedLang(col("text")).as("l")))
    }
    // stage C: md5 + tokenize (the narrow annotate scan)
    time("md5+tokenize scan") {
      noop(d.select(col("doc_id"), md5(col("text")).as("h"),
        TextFunctions.tokens(col("text")).as("t")))
    }
    // stage D: exact-dup groups only
    time("exact-dup groups") {
      noop(d.groupBy(md5(col("text")).as("h")).agg(min(col("doc_id"))))
    }
    // stage E: portable band buckets (shingle explode + md5 base + 32 mins)
    val toks = d.select(col("doc_id"),
      TextFunctions.tokens(col("text")).as("toks"))
    time("portable band buckets") {
      noop(Dedup.portableBandBuckets(toks, 3, 32, 8))
    }
    // stage F: buckets -> candidate pairs (the shuffle+cap stage)
    time("portable pairs (buckets+groupPairs)") {
      noop(Dedup.portablePairsFromTokens(toks, 3, 32, 8))
    }
    spark.stop()
  }
}
