package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[graft.functions.expr.GraftXxMinSig]] must replay the explode +
  * nPerms-min-aggregation spelling of the xxhash64 MinHash family
  * bit-for-bit, for BOTH derivePerms families — the draws feed every
  * committed band bucket, so a single differing bit re-buckets the corpus.
  */
class XxMinSigSpec extends SparkSpec {

  import spark.implicits._
  import TextFunctions._

  /** The pre-r16 explode+aggregate spelling, verbatim (minus banding). */
  private def sigAgg(docs: DataFrame, shingleN: Int, nPerms: Int,
      derivePerms: Boolean): DataFrame = {
    val shRaw = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        explode(arrayBarrier(shinglesFromTokens(col("toks"), shingleN))).as("shingle"))
    val sh =
      if (derivePerms) shRaw.select(col("doc_id"), xxhash64(col("shingle")).as("shingle"))
      else shRaw
    sh.groupBy(col("doc_id")).agg(
      min(xxhash64(col("shingle"), lit(0))).as("h0"),
      (1 until nPerms).map(seed =>
        min(xxhash64(col("shingle"), lit(seed))).as(s"h$seed")): _*)
  }

  private def sigNat(docs: DataFrame, shingleN: Int, nPerms: Int,
      derivePerms: Boolean): DataFrame = {
    import org.apache.spark.sql.{GraftSqlBridge => B}
    docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), B.column(graft.functions.expr.GraftXxMinSig(
        B.expression(col("toks")), shingleN, nPerms, derivePerms)).as("sig"))
      .where(col("sig").isNotNull)
  }

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),
    (3L, "a b c a b c a b c"),          // duplicate shingles: min unchanged
    (4L, "x y"),                         // below the 3-shingle horizon -> absent
    (5L, ""),                            // zero tokens -> absent
    (6L, "ünïcode tökens reorder ünïcode tökens reorder tail")
  )

  private def check(derivePerms: Boolean): Unit = {
    val d = docs.toDF("doc_id", "text")
    val n = 32
    val agg = sigAgg(d, 3, n, derivePerms).collect()
      .map(r => r.getLong(0) -> (1 to n).map(i => r.getLong(i)).toVector).toMap
    val nat = sigNat(d, 3, n, derivePerms).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    assert(nat == agg, s"derivePerms=$derivePerms: native $nat vs agg $agg")
    assert(!nat.contains(4L) && !nat.contains(5L),
      "short docs must have no signature row")
  }

  test("fixture docs: native signature equals the aggregation (derivePerms=false)") {
    check(derivePerms = false)
  }

  test("fixture docs: native signature equals the aggregation (derivePerms=true)") {
    check(derivePerms = true)
  }

  test("real corpus (sf0.001): identical signatures on every doc") {
    val d = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val n = 32
    val agg = sigAgg(d, 3, n, derivePerms = false)
      .select(col("doc_id"), array((0 until n).map(i => col(s"h$i")): _*).as("sig"))
    val diff = agg.withColumnRenamed("sig", "a")
      .join(sigNat(d, 3, n, derivePerms = false).withColumnRenamed("sig", "b"),
        Seq("doc_id"), "full")
      .where(not(col("a") <=> col("b")))
      .count()
    assert(diff == 0, s"$diff docs diverged between native and aggregation signatures")
  }
}
