package graft.tools

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for the heavy extension operators (uses the same
  * materialize-tokens + arrayBarrier idioms as the operators — see
  * SCALE.md "Optimizer pathologies" for why both matter).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      val cold = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); f
      val warm = (System.nanoTime() - t1) / 1e9
      println(f"[profile] $name: cold $cold%.2f s, warm $warm%.2f s"); r
    }
    val docs = Tables.load(spark, sfDir, "documents")
    docs.count() // warm

    val tok = docs.select(col("doc_id"), tokens(col("text")).as("toks"))
    val sh = tok.select(col("doc_id"),
      explode(arrayBarrier(shinglesFromTokens(col("toks"), 3))).as("shingle"))
    time("explode shingles count")(sh.count())
    val hashed1 = sh.select(col("doc_id"), xxhash64(col("shingle"), lit(0)).as("h"))
    time("hash x1 count")(hashed1.count())
    val sig = sh.groupBy(col("doc_id")).agg(
      min(xxhash64(col("shingle"), lit(0))).as("h0"),
      (1 until 32).map(s => min(xxhash64(col("shingle"), lit(s))).as(s"h$s")): _*)
    time("32-min signature")(sig.count())
    val bands = sig.select(col("doc_id"), explode(array((0 until 8).map { b =>
      struct(lit(b).as("band"), xxhash64(((b * 4 until (b + 1) * 4)
        .map(i => col(s"h$i")) :+ lit(b).cast("long")): _*).as("bucket"))
    }: _*)).as("bb")).select(col("doc_id"), col("bb.band"), col("bb.bucket"))
    time("bands")(bands.count())
    time("full minhashPairs")(
      graft.operators.Dedup.minhashPairs(docs, "doc_id", "text").count())
    time("full jaccardPairs")(
      graft.operators.Dedup.jaccardPairs(docs, "doc_id", "text").count())
    time("full winnowPairs")(
      graft.operators.Dedup.winnowPairs(docs, "doc_id", "text").count())
    time("full simhashPairs")(
      graft.operators.Dedup.simhashPairs(docs, "doc_id", "text").count())
    spark.stop()
  }
}
