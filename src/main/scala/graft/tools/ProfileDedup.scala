package graft.tools

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing breakdown of the n-gram Jaccard pipeline (the shared
  * floor under q_dedup_jaccard / q_dedup_editdist / q_dedup_clusters) —
  * run ad hoc when tuning:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.ProfileDedup"
  */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = Tables.load(spark, sfDir, "documents")
    // warmup: JVM + codegen for every expression under test — report the
    // SECOND iteration, or tokenize eats the whole codegen bill
    docs.count()
    graft.operators.Dedup.jaccardPairs(docs, "doc_id", "text").count()

    time("scan only")(docs.select("doc_id").count())
    time("tokenize")(
      docs.select(size(tokens(col("text"))).as("nt")).agg(sum("nt")).head())
    val byDoc = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        arrayBarrier(array_distinct(shinglesFromTokens(col("toks"), 3))).as("shs"))
      .select(col("doc_id"), col("shs"), explode(col("shs")).as("shingle"))
      .select(col("doc_id"), size(col("shs")).as("n"), col("shingle"))
    time("tokenize+shingle+explode (no shuffle)")(byDoc.count())
    val rep = byDoc.repartition(col("shingle"))
    time("+ repartition(shingle)")(rep.count())
    time("full jaccardPairs")(
      graft.operators.Dedup.jaccardPairs(docs, "doc_id", "text").count())
    spark.stop()
  }
}
