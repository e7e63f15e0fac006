// Lives in graft.operators to reach the private PairGen machinery — a
// dev-only profiler, not part of the operator surface.
package graft.operators

import graft.Tables
import graft.functions.TextFunctions.{arrayBarrier, shinglesFromTokens, tokens}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r13 sf10 shakeout experiment: the shinglePairs doc comment pins exact
  * STRING shingle keys over hashed ones on an sf0.1 measurement (2.05 s vs
  * 2.23 s) and says to revisit "only if profile shows the shingle exchange
  * (not the pair join) dominating" — which the sf10 ladder now does
  * (~60 s, exchange-bound). This times the committed spelling against an
  * xxhash64-keyed variant (8-byte keys vs ~30-byte strings through the
  * exchange + both groupPairs passes) on the same corpus, plus the
  * collision census that would gate any switch (distinct shingles vs
  * distinct hashes — a collision would merge two shingle groups and could
  * fabricate candidate intersections, breaking the bit-exact oracle).
  *
  * Usage: runMain graft.operators.ProfileShingleKeys <sfDir> [repeats]
  */
object ProfileShingleKeys {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val repeats = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val d = Tables.load(spark, sfDir, "documents")
    d.count()

    def time(label: String)(f: => Any): Unit = {
      val ts = (1 to repeats).map { _ =>
        val t0 = System.nanoTime()
        val r = f
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"  $label -> $r ($dt%.2f s)")
        dt
      }
      println(f"[prof] $label runs ${ts.map(t => f"$t%.2f").mkString(", ")}")
    }

    val byDocBase = d
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        arrayBarrier(array_distinct(shinglesFromTokens(col("toks"), 3))).as("shs"))
      .select(col("doc_id"), col("shs"), explode(col("shs")).as("shingle"))
      .select(col("doc_id"), size(col("shs")).as("n"), col("shingle"))

    time("string_keys_committed") {
      val byDoc = byDocBase.repartition(col("shingle"))
      PairGen.groupPairs(byDoc, Seq("shingle"),
          struct(col("doc_id"), col("n")).as("dn"), 20)
        .count()
    }

    time("xxhash64_keys") {
      val byDoc = byDocBase
        .select(col("doc_id"), col("n"), xxhash64(col("shingle")).as("sh"))
        .repartition(col("sh"))
      PairGen.groupPairs(byDoc, Seq("sh"),
          struct(col("doc_id"), col("n")).as("dn"), 20)
        .count()
    }

    time("collision_census") {
      val sh = byDocBase.select(col("shingle")).distinct()
      val nStr = sh.count()
      val nHash = sh.select(xxhash64(col("shingle"))).distinct().count()
      s"distinct_shingles=$nStr distinct_hashes=$nHash collisions=${nStr - nHash}"
    }
    spark.stop()
  }
}
