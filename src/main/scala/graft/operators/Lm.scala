package graft.operators

import graft.functions.TextFunctions.{arrayBarrier, shinglesNative, tokens}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-gram language-model quality scoring — the CCNet/Gopher-style
  * "perplexity filter" stage of an LLM data pipeline: score every document
  * by how predictable its text is under a count-based bigram model trained
  * on the corpus itself, so downstream gates can drop the gibberish tail
  * (very negative mean log-prob) or the boilerplate head (suspiciously high).
  *
  * The reference pipeline has no LM stage (it is an energy-simulation ETL —
  * SURVEY.md §2.13 extension surface); the model here is the classic
  * add-one-smoothed bigram estimator, chosen over a neural scorer because
  * it is exactly recomputable by the DuckDB oracle:
  *
  *   P(w₂ | w₁) = (c(w₁w₂) + 1) / (c(w₁) + V)
  *
  * with c(·) corpus counts and V the distinct-unigram vocabulary size;
  * a document's score is the mean ln P over its bigrams.
  *
  * Scale shape (the [[Dedup.dupSpanStats]] pattern): one tokenize pass feeds
  * both count sides; the exploded doc-bigram relation is repartitioned on
  * the bigram key ONCE so the bigram-count aggregation and the count join
  * reuse the same Exchange; unigram counts join on the bigram's first word
  * (one more bounded-key shuffle — vocabulary rows, not corpus rows); the
  * final re-agg shuffles one row per (doc, bigram) back to the doc key. No
  * driver-side state at all — the "model" never materializes anywhere; it
  * IS the two count relations. At 100 TB every shuffle key is a token or
  * doc id; map-side partial aggregation collapses the Zipf head before the
  * wire, and no stage is quadratic in anything.
  */
object Lm {

  /** Score `docs` under a corpus-trained add-one bigram LM.
    *
    * Output: one row per input doc —
    *   - `n_bigrams`  exact bigram count (0 for docs with < 2 tokens),
    *   - `lm_logp`    mean ln P(w₂|w₁), snapped at 1e-6 (sum order is
    *                  engine/partitioning-specific; the per-bigram terms
    *                  themselves are IEEE-deterministic), NULL when the doc
    *                  has no bigrams — a "cannot score" is not a score of 0.
    */
  def bigramScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toked = docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      // a NULL id can never match the final restore join; filtering
      // explicitly keeps the filter in BOTH consumers of the bigram
      // exchange (the left-outer restore infers it into one branch only,
      // breaking exchange reuse — the dupSpanStats lesson)
      .where(col("doc_id").isNotNull)

    // unigram counts + vocabulary size: the denominator side of the model.
    // The vocab count carries a pruneGuard on c1 so its copy of the unigram
    // aggregation keeps the count function — identical subtrees, ONE
    // execution of the token explode for both consumers.
    val uni = toked
      .select(explode(arrayBarrier(col("toks"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c1"))
    val vocab = uni.agg(
      (count(lit(1)) + Dedup.pruneGuard(col("c1"))).as("vocab"))

    // exploded doc bigrams, partitioned ONCE on the bigram key so the count
    // aggregation and the join back both sit on the same Exchange
    // (ReusedExchange — the dupSpanStats shape)
    val byDoc = toked
      .select(col("doc_id"),
        // barrier: see TextFunctions.arrayBarrier — without it the inferred
        // Generate guard re-runs the tokenize→shingle chain at the scan
        explode(shinglesNative(col("toks"), 2, distinct = false)).as("bigram"))
      // semantically a no-op (substring_index is null only for null input):
      // the w₁ join downstream INFERS this constraint and pushes it below
      // the exchange of whichever consumer derives w — stating it here
      // keeps both consumers' subtrees identical, so the bigram Exchange is
      // planned once and Reused instead of re-running the explode
      .where(col("bigram").isNotNull &&
        substring_index(col("bigram"), " ", 1).isNotNull)
      .repartition(col("bigram"))
    // per-DISTINCT-bigram log-probability: the w₁ unigram join and the
    // vocab broadcast run over the vocabulary-sized count relation, never
    // the corpus-sized explode (they'd also push an asymmetric
    // isnotnull(substring_index(..)) filter under byDoc's exchange and
    // break its reuse). w₁ = everything before the single separator space —
    // tokens are whitespace-split, so a bigram has exactly one space.
    // cb+1.0 exact, c1+vocab exact integer, one IEEE division, one ln —
    // bit-reproducible per term on any engine; only the per-doc MEAN's
    // accumulation order varies, hence the 1e-6 snap below.
    // prune guard (see [[Dedup.pruneGuard]]): without the no-op doc_id term,
    // column pruning narrows this branch to (bigram) while the probe branch
    // keeps (doc_id, bigram) — the two Exchange subtrees then canonicalize
    // UNEQUAL and the explode executes twice (one full extra corpus scan at
    // 100 TB). With it, both consumers read the same exchange
    // (ReusedExchange — spec-pinned).
    val bc = byDoc.groupBy(col("bigram"))
      .agg((count(lit(1)) + Dedup.pruneGuard(col("doc_id"))).as("cb"))
      .withColumn("w", substring_index(col("bigram"), " ", 1))
      .join(uni, "w")
      .crossJoin(broadcast(vocab))
      .select(col("bigram"),
        log((col("cb") + lit(1.0)) / (col("c1") + col("vocab"))).as("logp"))

    val scored = byDoc
      .join(bc, "bigram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), avg(col("logp")).as("m"))

    docs.select(col(idCol).as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).cast("int").as("n_bigrams"),
        (floor(col("m") * 1e6 + 0.5) / 1e6).as("lm_logp"))
  }
}
