package graft.operators

import graft.{SparkSpec, Tables}
import graft.functions.VectorNative.cosine
import org.apache.spark.sql.functions._

/** Ground-truth gates for the approximate ANN/near-dup family: each
  * approximate operator is measured against the EXACT answer computed on the
  * same data (brute-force cosine top-k / all-pairs cosine), so "runs without
  * error" is upgraded to "provably close". Thresholds sit below the measured
  * recall with margin, but high enough that a broken hash family, a wrong
  * bucket join, or a centroid-assignment bug (which crater recall toward 0)
  * fails loudly. Complements the driver's rows-only check, which cannot see
  * recall (xxhash64-derived buckets have no DuckDB oracle).
  */
class RecallSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"
  private lazy val emb = Tables.load(spark, sf, "embeddings")
  private lazy val q = Similarity.vectorOf(spark, emb, "vec_id", "embedding", 0L)

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("vec_id").collect().map(_.getLong(0)).toSet

  private lazy val bruteTop20: Set[Long] =
    ids(Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 20))

  test("LSH top-k recall@20 vs brute force (same params as q_sim_lsh)") {
    val lsh = ids(Similarity.lshTopK(emb, "vec_id", "embedding", q,
      dims = 64, nPlanes = 4, k = 20, nTables = 8))
    val recall = (lsh & bruteTop20).size / 20.0
    assert(recall >= 0.5, s"LSH recall@20 = $recall (expected >= 0.5)")
  }

  test("multi-table OR-amplification strictly widens the single-table " +
    "candidate set") {
    val single = ids(Similarity.lshTopK(emb, "vec_id", "embedding", q,
      dims = 64, nPlanes = 4, k = 500, nTables = 1))
    val multi = ids(Similarity.lshTopK(emb, "vec_id", "embedding", q,
      dims = 64, nPlanes = 4, k = 500, nTables = 8))
    assert(single.subsetOf(multi),
      s"table 0's bucket lost members: ${(single -- multi).take(5)}")
    assert(multi.size > single.size, "8 tables found nothing beyond table 0")
  }

  test("IVF probe recall@20 vs brute force (same params as q_sim_ivf)") {
    val model = Ivf.train(emb, "vec_id", "embedding", k = 8, iters = 2)
    val ivf = ids(Ivf.topK(emb, "vec_id", "embedding", model, q,
      nProbe = 2, k = 20))
    val recall = (ivf & bruteTop20).size / 20.0
    assert(recall >= 0.5, s"IVF recall@20 = $recall (expected >= 0.5)")
  }

  test("embedding near-dup pairs recall vs exact all-pairs at the same " +
    "threshold (same params as q_sim_neardup)") {
    // exact ground truth: all (a < b) pairs with cosine >= 0.2 — a genuine
    // O(n²) crossJoin, affordable only because this is a 500-vector test
    // fixture (the operator under test exists precisely to avoid this plan)
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    val exact = a.crossJoin(b)
      .where(col("id_a") < col("id_b"))
      .where(cosine(col("va"), col("vb")) >= 0.2)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val found = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
      dims = 64, nPlanes = 4, minSim = 0.2, nTables = 8)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(exact.nonEmpty, "degenerate fixture: no exact pairs above 0.2")
    // no false positives: every emitted pair really is above threshold
    // (bucketing only restricts WHICH pairs are compared, never the math)
    assert((found -- exact).isEmpty,
      s"false positives: ${(found -- exact).take(5)}")
    val recall = (found & exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"near-dup recall = $recall (expected >= 0.5)")
  }
}
