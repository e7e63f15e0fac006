package graft.tools

import graft.Tables
import graft.functions.TextFunctions
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only A/B profile of the MinHash signature families: re-hash
  * (nPerms string hashes per shingle) vs derived (one string hash, perms
  * drawn from the 8-byte base). Median-of-3 warm runs per family.
  */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val toks = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
    def run(derive: Boolean): Double = {
      val t0 = System.nanoTime()
      Dedup.minhashPairsFromTokens(toks, derivePerms = derive)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run(derive = false) // warmup
    for (nPerms <- Seq(32)) {
      val rehash = Seq.fill(3)(run(false)).sorted.apply(1)
      val derived = Seq.fill(3)(run(true)).sorted.apply(1)
      println(f"[minhash] nPerms=$nPerms rehash $rehash%.2f s, " +
        f"derived $derived%.2f s (${rehash / derived}%.2fx)")
    }
    spark.stop()
  }
}
