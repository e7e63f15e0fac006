package graft.operators

import graft.{SparkEntry, SparkSpec, Tables}
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** The MinHash estimator-calibration loop closed as a gate (VERDICT r9 #3):
  * q_minhash_calibration measures per-pair signature error against true
  * Jaccard; this spec turns the measured curve into the production knob —
  * the recommended (nPerms, nBands) operating points at the deployed 0.5
  * (near-dup) and 0.9 (contamination) thresholds — and pins them, so a
  * banding or hash-family change that degrades measured calibration fails
  * here by name instead of silently shifting dedup recall.
  */
class MinhashCalibrationSpec extends SparkSpec {

  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.01"

  test("analytic S-curve: monotone in similarity and in band count, " +
    "threshold formula matches the curve") {
    val probs = (1 to 9).map(i => Dedup.lshCandidateProb(i / 10.0, 8, 4))
    assert(probs == probs.sorted, "catch probability must rise with similarity")
    val byBands = Seq(1, 2, 4, 8, 16, 32)
      .map(b => Dedup.lshCandidateProb(0.7, b, 32 / b))
    assert(byBands == byBands.sorted, "more bands must never lower recall")
    // at s = threshold the curve sits at 1-(1-1/b)^b → 1-1/e ≈ 0.63
    val t = Dedup.lshThresholdSim(8, 4)
    assert(math.abs(t - 0.5946) < 1e-3)
    assert(math.abs(Dedup.lshCandidateProb(t, 8, 4) - (1 - math.pow(1 - 1.0 / 8, 8))) < 1e-12)
  }

  test("recommended operating points at the deployed thresholds are pinned") {
    // contamination tier (0.9 Jaccard): the DEPLOYED default 8 bands of 4
    // is exactly the fewest-bands banding with >= 0.9 recall there
    // (recall 0.9998); 4x8 just misses at 0.895
    assert(Dedup.recommendBanding(32, 0.9, 0.9) == Some(8))
    assert(Dedup.lshCandidateProb(0.9, 8, 4) > 0.999)
    // near-dup tier (0.5 Jaccard): needs 16 bands of 2 (recall 0.990);
    // the deployed 8x4 catches only 0.404 there — production survives
    // because exact verify rides on top, but a BANDED-ONLY consumer at
    // 0.5 must take the 16x2 point
    assert(Dedup.recommendBanding(32, 0.5, 0.9) == Some(16))
    assert(Dedup.lshCandidateProb(0.5, 8, 4) < 0.45)
    assert(Dedup.lshCandidateProb(0.5, 16, 2) > 0.98)
    // infeasible contract: even 1-row bands can't reach it → None, the
    // caller needs more permutations
    assert(Dedup.recommendBanding(4, 0.1, 0.99).isEmpty)
  }

  test("measured calibration at sf0.01: estimator error small and " +
    "unbiased, empirical band catch matches the analytic curve") {
    val cal = SparkEntry.queries("q_minhash_calibration")(spark, sfDir)
      .select($"doc_a", $"doc_b", $"true_jaccard", $"est_jaccard", $"abs_err")
      .collect()
    // the candidate population at sf0.01 is 25 pairs (jaccardPairs'
    // minJaccard=0.3 gate) — small but deterministic; the guard only
    // protects against the pair machinery going empty
    assert(cal.length >= 20, s"calibration needs pairs, got ${cal.length}")
    val absErrs = cal.map(_.getDouble(4))
    val bias = cal.map(r => r.getDouble(3) - r.getDouble(2))
    // mean |err| well inside the 1/sqrt(32)=0.177 textbook bound (measured
    // 0.029 at sf0.01); the margin absorbs the smaller-SF pair population
    assert(absErrs.sum / absErrs.length <= 0.08,
      f"mean abs err ${absErrs.sum / absErrs.length}%.4f")
    // the S-curve premise: per-perm agreement is an UNBIASED Jaccard draw
    assert(math.abs(bias.sum / bias.length) <= 0.03,
      f"estimator bias ${bias.sum / bias.length}%.4f")

    // Empirical catch under the deployed 8x4 banding, on the SAME pairs:
    // a pair is caught iff some band of 4 consecutive signature rows fully
    // agrees. Candidates come from rare-shingle overlap (jaccardPairs),
    // not from the banding, so this measures the banding, not itself.
    val d = Tables.load(spark, sfDir, "documents")
    val tok = d.select($"doc_id", TextFunctions.tokens($"text").as("toks"))
    val sigs = Dedup.portableSignatures(tok)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def caught(a: Long, b: Long): Boolean = {
      val (sa, sb) = (sigs(a), sigs(b))
      (0 until 8).exists(band =>
        (band * 4 until band * 4 + 4).forall(i => sa(i) == sb(i)))
    }
    val empirical = cal.map(r =>
      if (caught(r.getLong(0), r.getLong(1))) 1.0 else 0.0)
    val predicted = cal.map(r => Dedup.lshCandidateProb(r.getDouble(2), 8, 4))
    val (em, pm) = (empirical.sum / cal.length, predicted.sum / cal.length)
    // mean empirical catch vs mean analytic prediction over the measured
    // jaccard mix — the calibration curve validating the S-curve's premise
    assert(math.abs(em - pm) <= 0.10,
      f"empirical band catch $em%.3f vs analytic $pm%.3f")
  }
}
