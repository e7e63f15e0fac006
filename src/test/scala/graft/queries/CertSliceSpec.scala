package graft.queries

import java.nio.file.Files

import scala.collection.mutable

import graft.{SparkEntry, SparkSpec}

/** Over-threshold gate for the `certTruthSlice` branch of the two declared
  * crossJoin-truth queries (VERDICT r10 #1): a synthetic >10k-vector
  * embeddings corpus pushes both `q_sim_neardup` and `q_sim_clusters` past
  * `SimParams.maxFullTruthVectors`, and their output is cross-checked
  * against a sliced-oracle replay computed independently in plain Scala
  * with the same left-to-right double accumulation as `GraftCosine` /
  * DuckDB's `list_sum` — so the compare is bit-exact, not tolerance-based.
  * The fixture is clustered (one-hot label axes + small deterministic
  * noise) so within-cluster cosine ≈ 1 and cross-cluster ≈ 0: no pair sits
  * near either threshold and the LSH recall flag is structurally safe.
  *
  * This is the branch the driver gate can never reach (every tested SF is
  * under the cutoff); without it the slice semantics — BOTH engines
  * restricting to `vec_id % 20 = 0`, vertices included — were spec-free.
  */
class CertSliceSpec extends SparkSpec {

  import spark.implicits._

  private val nVec = 10040 // > SimParams.maxFullTruthVectors = 10000
  private val dims = 64
  // coprime to the % 20 slice stride, so the sliced subset covers every
  // cluster (~9.5 members each) instead of aliasing onto a handful
  private val nLabels = 53

  /** one-hot cluster axis + seedless sin-noise (the growth-twin
    * perturbation convention — rerun-stable without a Random seed)
    */
  private def vecOf(id: Long): Array[Float] = {
    val l = (id % nLabels).toInt
    Array.tabulate(dims) { d =>
      val base = if (d == l) 1.0f else 0.0f
      base + (math.sin(id * 131.0 + d * 17.0) * 0.02).toFloat
    }
  }

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_certslice_").toString
    (0L until nVec.toLong).map(i => (i, vecOf(i).toSeq, (i % nLabels).toInt))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  private val slicedIds: Seq[Long] = 0L until nVec.toLong by 20L

  /** Mirrors VectorExprs.dotNorms exactly: per-element float→double cast,
    * each accumulator summed left-to-right — bit-identical to the codegen
    * loop and to DuckDB's list_sum over the same casts.
    */
  private def cosExact(x: Array[Float], y: Array[Float]): Double = {
    var dd = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < dims) {
      val xi = x(i).toDouble; val yi = y(i).toDouble
      dd += xi * yi; na += xi * xi; nb += yi * yi; i += 1
    }
    dd / (math.sqrt(na) * math.sqrt(nb))
  }

  private lazy val slicedPairs: Seq[(Long, Long, Double)] = {
    val vs = slicedIds.map(i => i -> vecOf(i)).toMap
    for {
      a <- slicedIds; b <- slicedIds if a < b
      c = cosExact(vs(a), vs(b)) if c >= 0.2
    } yield (a, b, c)
  }

  test("q_sim_neardup over the cutoff: pairs come from the % 20 slice only " +
    "and match the sliced-oracle replay bit-exact, recall flag TRUE") {
    val rows = SparkEntry.queries("q_sim_neardup")(spark, dir).collect()
    assert(rows.forall(_.getBoolean(3)),
      "recall_ok must hold on the sliced branch (oracle declares literal TRUE)")
    val got = rows.map(r => (r.getLong(0), r.getLong(1),
      java.lang.Double.doubleToLongBits(r.getDouble(2)))).toSet
    assert(got.forall { case (a, b, _) => a % 20 == 0 && b % 20 == 0 },
      "a pair escaped the certification slice")
    val want = slicedPairs.map { case (a, b, c) =>
      (a, b, java.lang.Double.doubleToLongBits(c)) }.toSet
    assert(want.nonEmpty && got == want,
      s"sliced truth mismatch: spark=${got.size} replay=${want.size} " +
        s"onlySpark=${(got -- want).take(3)} onlyReplay=${(want -- got).take(3)}")
  }

  test("q_sim_clusters over the cutoff: vertices AND edges are sliced; " +
    "components match a union-find replay of the sliced >= 0.4 graph") {
    val parent = mutable.Map(slicedIds.map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    val vs = slicedIds.map(i => i -> vecOf(i)).toMap
    for (a <- slicedIds; b <- slicedIds if a < b
         if cosExact(vs(a), vs(b)) >= 0.4) {
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb
    }
    val minOfRoot = slicedIds.groupBy(find).map { case (r, ms) => r -> ms.min }
    val want = slicedIds.map(i => (i, minOfRoot(find(i)))).toSet

    val rows = SparkEntry.queries("q_sim_clusters")(spark, dir).collect()
    assert(rows.length == slicedIds.size,
      s"vertex set must be the slice: ${rows.length} rows vs ${slicedIds.size}")
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"component mismatch: ${(got -- want).take(3)} / " +
      s"${(want -- got).take(3)}")
    assert(rows.forall(r => r.getBoolean(2) == (r.getLong(1) == r.getLong(0))))
  }

  test("the oracle SQL carries the same guard as the Spark plan: " +
    "count-gated at 10000, % 20 slice, on BOTH queries") {
    for (q <- Seq("q_sim_neardup", "q_sim_clusters")) {
      val sql = SparkEntry.oracleSql(q)
      assert(sql.contains("(SELECT count(*) FROM embeddings) <= 10000"),
        s"$q oracle lost the count guard")
      assert(sql.contains("vec_id % 20 = 0"), s"$q oracle lost the slice")
      assert(sql.contains("emb_cert"), s"$q oracle no longer joins the " +
        "count-guarded CTE")
    }
  }
}
