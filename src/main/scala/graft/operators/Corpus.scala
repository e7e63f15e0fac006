package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus cleaning — the composition an LLM training-data
  * pipeline actually runs, built from this engine's own operators:
  *
  *   1. quality gate   (map-only: stopword/alpha/length blend)
  *   2. language gate  (map-only: marker-hit argmax)
  *   3. exact dedup    (one hash shuffle; min-id survivor)
  *   4. near dedup     (MinHash-LSH candidates; greedy keep-smallest-id)
  *
  * Output = the input annotated with `keep` and the FIRST failing
  * `drop_reason` ('quality' | 'lang' | 'exact_dup' | 'near_dup' | NULL), so
  * the caller can either `filter($"keep")` or audit the funnel per stage —
  * the shape production cleaning jobs want (drop accounting is a first-class
  * deliverable, not a side effect).
  *
  * Scale: ONE annotate scan computes quality/lang/hash/tokens and persists
  * (MEMORY_AND_DISK — spills, never OOMs); stage 3 is one shuffle of
  * (hash, id) off that cache; stage 4 is the LSH candidate shape (bounded
  * buckets, no O(n²)) fed the shared tokens. The raw corpus is read once.
  * Near-dup keeps the smaller doc_id of every confident pair — the standard
  * greedy approximation of connected-component dedup (no iterative
  * union-find job; a doc paired only with already-dropped docs is still
  * dropped, which over-drops slightly and never under-drops).
  */
object Corpus {

  def clean(docs: DataFrame, idCol: String, textCol: String,
      minQuality: Double = 0.3,
      keepLangs: Set[String] = Set("en"),
      minBands: Long = 6L,
      shingleN: Int = 3, nPerms: Int = 32, nBands: Int = 8): DataFrame = {
    require(minBands >= 1 && minBands <= nBands,
      s"minBands ($minBands) must be in [1, nBands=$nBands]")

    val id = col(idCol)

    // ONE annotate scan computes everything every stage needs — quality,
    // lang, content hash, tokens — then persists (spilling to disk at
    // corpus scale): three downstream consumers (exact-dup groups, minhash
    // candidates, final assembly) read the materialized pass instead of
    // re-scanning + re-tokenizing the raw corpus three times.
    val annotated = docs
      .withColumn("quality_score", TextFunctions.qualityScore(col(textCol)))
      .withColumn("predicted_lang", TextFunctions.predictedLang(col(textCol)))
      .withColumn("__hash", md5(col(textCol)))
      .withColumn("__toks", TextFunctions.tokens(col(textCol)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // stage 3: exact-dup survivors (min id per content hash); only
    // (__hash, id) reaches the shuffle — column pruning on the cache
    val keepers = annotated
      .groupBy(col("__hash").as("text_hash"))
      .agg(min(id).as("keep_id"))

    // stage 4: near-dup drops = larger id of every confident candidate pair
    // (pairs are (a < b) by construction); shares the annotate pass's tokens
    val nearDrops = Dedup
      .minhashPairsFromTokens(
        annotated.select(id.as("doc_id"), col("__toks").as("toks")),
        shingleN, nPerms, nBands)
      .where(col("n_bands") >= minBands)
      .select(col("doc_b").as("__near_drop")).distinct()

    annotated
      // keepers is one row per DISTINCT text — corpus-sized, never broadcast
      .join(keepers, col("__hash") === col("text_hash"), "left")
      .join(nearDrops, id === col("__near_drop"), "left")
      .withColumn("drop_reason",
        // NULL text first: every later gate evaluates to NULL (not true)
        // for it, so without this a NULL document FAILS OPEN as keep=true
        when(col(textCol).isNull, "null_text")
          .when(col("quality_score") < minQuality, "quality")
          .when(!col("predicted_lang").isin(keepLangs.toSeq: _*), "lang")
          .when(id =!= col("keep_id"), "exact_dup")
          .when(col("__near_drop").isNotNull, "near_dup"))
      .withColumn("keep", col("drop_reason").isNull)
      .drop("__hash", "__toks", "text_hash", "keep_id", "__near_drop")
  }

  /** Per-stage funnel counts over a [[clean]] result — the audit artifact. */
  def funnel(cleaned: DataFrame): DataFrame =
    cleaned.groupBy(coalesce(col("drop_reason"), lit("kept")).as("stage"))
      .agg(count(lit(1)).as("n_docs"))
}
