package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[graft.functions.expr.GraftSimhash]] must equal the explode +
  * 64-conditional-sum aggregation spelling it replaced in
  * [[graft.operators.Dedup.simhash]] — same xxhash64 seed-42 draws, same
  * vote/tie semantics, same "token-less docs have no row" behavior.
  */
class SimhashExprSpec extends SparkSpec {

  import spark.implicits._
  import TextFunctions._

  /** The pre-r16 aggregation spelling, verbatim. */
  private def simhashAgg(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"),
      explode(arrayBarrier(tokens(col("text")))).as("token"))
      .withColumn("h", xxhash64(col("token")))
    val bitSums = (0 until 64).map { j =>
      sum(when(shiftrightunsigned(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"b$j")
    }
    val sums = tok.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val hash = (0 until 64).map { j =>
      when(col(s"b$j") > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }.reduce(_ + _)
    sums.select(col("doc_id"), hash.as("simhash"))
  }

  private def simhashNat(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), simhashNative(col("toks")).as("simhash"))
      .where(col("simhash").isNotNull)

  test("fixture shapes: native equals the aggregation spelling, token-less docs absent") {
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "the quick brown fox"),         // exact copy -> same hash
      (3L, "the quick brown cat"),
      (4L, "a"),                            // single token
      (5L, ""),                             // zero tokens -> NO row
      (6L, "x y x y x y x"),                // repeated occurrences all vote
      (7L, "ünïcode tökens vote too")
    ).toDF("doc_id", "text")
    val agg = simhashAgg(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nat = simhashNat(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nat == agg, s"native $nat vs aggregation $agg")
    assert(!nat.contains(5L), "token-less doc must have no hash row")
  }

  test("real corpus (sf0.001 documents): identical hash relation") {
    val d = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val diff = simhashAgg(d).withColumnRenamed("simhash", "a")
      .join(simhashNat(d).withColumnRenamed("simhash", "b"),
        Seq("doc_id"), "full")
      .where(not(col("a") <=> col("b")))
      .count()
    assert(diff == 0, s"$diff docs diverged between native and aggregation simhash")
  }
}
