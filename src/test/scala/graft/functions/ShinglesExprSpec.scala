package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[graft.functions.expr.GraftShingles]] must be bit-equal to the
  * declarative chain it replaced in the hot paths:
  * `array_distinct(shinglesFromTokens(toks, n))` (distinct) and
  * `shinglesFromTokens(toks, n)` (positional) — same strings, same order,
  * same short-doc empty array — on adversarial token shapes AND on the real
  * sf0.001 corpus.
  */
class ShinglesExprSpec extends SparkSpec {

  import spark.implicits._
  import TextFunctions._

  private val fixtures = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a a a a a a",                       // heavy duplication -> distinct shrinks
    "x y",                               // below every shingle horizon
    "one",                               // single token
    "",                                  // empty text -> zero tokens
    "  padded   whitespace   runs  ",    // tokenizer must agree on empties
    "ünïcode tökens reordered ünïcode tökens reordered extra",
    "tab\tand\nnewline separated tokens tab\tand\nnewline again",
    (1 to 200).map(i => s"t${i % 17}").mkString(" ") // long + cyclic dups
  )

  private def chkAgainstChain(n: Int): Unit = {
    val df = fixtures.toDF("text")
      .select(col("text"), tokens(col("text")).as("toks"))
      .select(
        shinglesNative(col("toks"), n).as("nat_d"),
        array_distinct(shinglesFromTokens(col("toks"), n)).as("chain_d"),
        shinglesNative(col("toks"), n, distinct = false).as("nat_p"),
        shinglesFromTokens(col("toks"), n).as("chain_p"))
    val bad = df.where(
      not(col("nat_d") <=> col("chain_d")) ||
        not(col("nat_p") <=> col("chain_p"))).collect()
    assert(bad.isEmpty, s"n=$n diverged on: ${bad.mkString("; ")}")
  }

  test("fixture shapes: distinct and positional forms equal the chain (n=2,3,8)") {
    Seq(2, 3, 8).foreach(chkAgainstChain)
  }

  test("real corpus (sf0.001 documents): bit-equal arrays on every doc, n=3") {
    val d = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    val bad = d.select(col("doc_id"),
        shinglesNative(col("toks"), 3).as("nat"),
        array_distinct(shinglesFromTokens(col("toks"), 3)).as("chain"))
      .where(not(col("nat") <=> col("chain")))
      .count()
    assert(bad == 0, s"$bad docs diverged from the declarative chain")
  }

  test("NULL token array yields NULL (documented consumer-indistinguishable caveat)") {
    val r = Seq((1L, null: String)).toDF("id", "text")
      .select(shinglesNative(tokens(col("text")), 3).as("s"))
      .head()
    assert(r.isNullAt(0))
    // and the consumers' view: explode drops the row either way
    val n = Seq((1L, null: String)).toDF("id", "text")
      .select(explode(shinglesNative(tokens(col("text")), 3)))
      .count()
    assert(n == 0)
  }

  test("codegen path stays compiled (no silent interpreted fallback)") {
    val key = "spark.sql.codegen.fallback"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try {
      val out = fixtures.toDF("text")
        .select(col("text"), tokens(col("text")).as("toks"))
        .select(explode(shinglesNative(col("toks"), 3)).as("sh"))
        .count()
      assert(out > 0)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
