package graft.tools

import graft.SparkSpec
import graft.functions.TextFunctions
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Pins the shakeout-corpus copy conventions that the committed
  * `bench_medians_sf1.tsv` baseline (and every ladder growth ratio in
  * SCALE.md) was measured under. The r13 sf10 ladder's first catch was a
  * CONVENTION defect, not a code defect — trailing-token copies multiplied
  * every shingle's document frequency ×m and silently degenerated the
  * rare-feature family to zero pairs — so the convention itself is now the
  * spec-gated contract:
  *
  *  1. copies are id-disjoint (ids shift by c·10⁷, copy 0 byte-identical);
  *  2. shingle document frequency is SCALE-INVARIANT (cross-copy shingle
  *     overlap zero — a ×m corpus has ×m distinct shingles at base df,
  *     never base shingles at ×m df);
  *  3. the rare-shingle pair structure reproduces per copy — jaccard pairs
  *     grow exactly ×m, each copy's pairs isomorphic to the base pairs.
  */
class GenScaleCorpusSpec extends SparkSpec {
  import spark.implicits._

  // four docs: one designed near-dup pair (a/b share most 3-shingles), two
  // unrelated docs; every shingle is rare (df ≤ 2) so the maxDf=20 gate
  // never intervenes and pair counts are purely convention-driven
  // n_chars mirrors the testdata invariant (n_chars = length(text)) —
  // docCopies recomputes it from the suffixed text, so copy 0 stays
  // byte-identical exactly when the base upholds the invariant
  private lazy val base = Seq(
    (0L, "alpha beta gamma delta epsilon zeta eta theta", "en", "web"),
    (1L, "alpha beta gamma delta epsilon zeta eta iota", "en", "web"),
    (2L, "one two three four five six seven eight nine", "en", "web"),
    (3L, "red orange yellow green blue indigo violet cyan", "en", "web")
  ).toDF("doc_id", "text", "lang", "source")
    .withColumn("n_chars", length(col("text")).cast("long"))

  private def shingleDf(df: org.apache.spark.sql.DataFrame) = df
    .select(col("doc_id"),
      explode(array_distinct(TextFunctions.shingles(col("text"), 3)))
        .as("shingle"))
    .groupBy("shingle").agg(countDistinct(col("doc_id")).as("df"))

  test("copies are id-disjoint and copy 0 is byte-identical to the base") {
    val m3 = GenScaleCorpus.docCopies(base, 3)
    assert(m3.count() === 12)
    assert(m3.select("doc_id").distinct().count() === 12, "id collision")
    // copy c ids live in [c·10⁷, c·10⁷ + 4)
    assert(m3.where(col("doc_id") >= 10000000L && col("doc_id") < 20000000L)
      .count() === 4)
    val copy0 = m3.where(col("doc_id") < 10000000L)
      .orderBy("doc_id").collect().toSeq
    assert(copy0 === base.orderBy("doc_id").collect().toSeq,
      "copy 0 must be byte-identical to the base corpus")
  }

  test("shingle document frequency is scale-invariant (the r13 catch)") {
    val dfBase = shingleDf(base)
    val dfM = shingleDf(GenScaleCorpus.docCopies(base, 5))
    // ×5 corpus → ×5 distinct shingles (zero cross-copy overlap) ...
    assert(dfM.count() === dfBase.count() * 5,
      "copies must not share shingles with the base or each other")
    // ... and the max df never grows: a ×m corpus has new shingles at BASE
    // df, never base shingles at ×m df (the trailing-token convention
    // failed exactly this — max df would read 5× here)
    val maxBase = dfBase.agg(max("df")).as[Long].head()
    val maxM = dfM.agg(max("df")).as[Long].head()
    assert(maxM === maxBase,
      s"df must not scale with the copy count (base max $maxBase, ×5 max $maxM)")
  }

  test("rare-shingle pair structure reproduces per copy: pairs grow exactly x m") {
    val basePairs = Dedup.jaccardPairs(base, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(basePairs === Set((0L, 1L)), "fixture should pair exactly docs 0/1")
    val m4 = Dedup.jaccardPairs(
        GenScaleCorpus.docCopies(base, 4), "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val expected = (0 until 4)
      .map(c => (c * 10000000L, c * 10000000L + 1L)).toSet
    assert(m4 === expected,
      "each copy must reproduce the base pair at its own id offset")
  }

  test("embedding copies are id-disjoint with copy 0 identical and others perturbed") {
    val e = Seq(
      (0L, Array(1.0f, 0.0f, 0.5f), "a"),
      (1L, Array(0.0f, 1.0f, 0.25f), "b")
    ).toDF("vec_id", "embedding", "label")
    val m3 = GenScaleCorpus.embCopies(e, 3)
    assert(m3.count() === 6)
    assert(m3.select("vec_id").distinct().count() === 6)
    val c0 = m3.where(col("vec_id") === 0L)
      .select("embedding").as[Array[Float]].head()
    assert(c0.toSeq === Seq(1.0f, 0.0f, 0.5f), "copy 0 unperturbed")
    val c1 = m3.where(col("vec_id") === 10000000L)
      .select("embedding").as[Array[Float]].head()
    assert(c1.toSeq !== Seq(1.0f, 0.0f, 0.5f), "copies must be perturbed")
    // seedless determinism: rebuilding yields the same bytes
    val again = GenScaleCorpus.embCopies(e, 3)
      .where(col("vec_id") === 10000000L)
      .select("embedding").as[Array[Float]].head()
    assert(c1.toSeq === again.toSeq, "perturbation must be rerun-stable")
  }
}
