package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** Gates the Bench driver contract's one fragile surface: the driver
  * records only the LAST 2000 characters of Bench stdout and parses the
  * final line as JSON. These tests replay that capture exactly — the
  * compact headline must be the last line, complete, parsable, and bounded
  * even in a mass-failure round — and pin the regression-tripwire rules
  * and the committed median snapshot's integrity.
  */
class BenchHeadlineSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  private def mkResults(n: Int, t: Double): Seq[(String, Double)] =
    (0 until n).map(i => f"q_some_long_query_name_$i%03d" -> t)

  private val subtimings = Bench.operatorSubs.values.toSeq.sorted.map(_ -> 1.25)

  private def headline(results: Seq[(String, Double)],
      regressions: Seq[Bench.RegFlag] = Nil): String =
    Bench.compactLine(results, subtimings, Seq(98.0, 99.5, 101.0), 1.03,
      "clean", regressions, "sf0.1", "/root/testdata/sf0.1")

  test("worst-case compact headline stays inside the driver tail window") {
    // every declared query failed AND every regression slot used — the
    // exact round where the tail window matters most must still hold one
    // complete JSON object with room to spare. Flag details use worst-width
    // numbers and the longest status so the bound is honest.
    val allFailed = mkResults(200, -1.0)
    val regs = (0 until 50).map(i => Bench.RegFlag(
      f"q_regressed_query_$i%03d", 9999.876, 1234.234, 9.123, 9999.999,
      8888.888, "confirmed-under-contention"))
    val line = headline(allFailed, regs)
    assert(line.length <= 1900, s"compact line is ${line.length} chars")
    val node = mapper.readTree(line)
    assert(node.get("n_failed").asInt() === 200)
    assert(node.get("failed").size() === 16)     // capped, count complete
    assert(node.get("n_regressions").asInt() === 50)
    assert(node.get("n_regressions_confirmed").asInt() === 50)
    assert(node.get("regressions").size() === 6) // capped, count complete
    // each shown flag carries base->med, its own sweep span, the re-measure,
    // and the adjudication status (VERDICT r13 #1a/#1c)
    val detail = node.get("regressions").get("q_regressed_query_000").asText()
    assert(detail === "1234.234->9999.876;sw=9.123..9999.999;re=8888.888;" +
      "confirmed-under-contention")
  }

  test("flag adjudication: re-measure and epoch validity annotate every " +
    "flag (a contended simulation yields zero unannotated flags)") {
    // re-measure back under the tripwire thresholds → transient
    assert(Bench.flagStatus(base = 5.29, remeasure = 6.1, "clean") === "transient")
    assert(Bench.flagStatus(base = 1.0, remeasure = 1.2, "contended") === "transient")
    // sub-floor move on a tiny query → transient even at a high ratio
    assert(Bench.flagStatus(base = 0.1, remeasure = 0.35, "clean") === "transient")
    // reproduces on a quiet re-run → confirmed, epoch noted when contended
    assert(Bench.flagStatus(base = 1.0, remeasure = 4.0, "clean") === "confirmed")
    assert(Bench.flagStatus(base = 1.0, remeasure = 4.0, "contended") ===
      "confirmed-under-contention")
    // re-measure RAN but errored (runOne's -1.0) → its own status, so a
    // regression-into-failure is visible in the artifact (ADVICE r14)
    assert(Bench.flagStatus(base = 1.0, remeasure = -1.0, "clean") ===
      "remeasure-failed")
    assert(Bench.flagStatus(base = 1.0, remeasure = -1.0, "contended") ===
      "remeasure-failed")
    // no re-measure available (beyond the cap / builder missing) → -2.0
    assert(Bench.flagStatus(base = 1.0, remeasure = -2.0, "clean") === "unremeasured")
    assert(Bench.flagStatus(base = 1.0, remeasure = -2.0, "contended") ===
      "contended-epoch")
    // the r13 driver epoch, simulated: dispersion 1.341 under the new
    // classifier is contended, and every flag raised there self-annotates
    val regs = Seq(("q_a", 40.79, 5.29), ("q_b", 13.7, 6.9), ("q_c", 4.2, 2.0))
    val minMax = Map("q_a" -> (6.2, 41.0), "q_b" -> (7.0, 14.1))
    val re = Map("q_a" -> 6.57, "q_b" -> 6.86)
    val flags = Bench.annotateFlags(regs, minMax, re, "contended")
    assert(flags.map(_.status) === Seq("transient", "transient", "contended-epoch"))
    assert(flags.forall(_.status.nonEmpty), "no flag may reach the artifact unannotated")
    assert(flags.head.detail === "5.29->40.79;sw=6.2..41.0;re=6.57;transient")
    // a flag with no recorded sweeps degrades to med..med, never throws
    assert(flags(2).swMin === 4.2 && flags(2).swMax === 4.2)
  }

  test("validity classifier: dispersion >= 1.3 reads contended (r13's " +
    "1.341 epoch wrote a x7.7 phantom under the old 1.5 gate)") {
    assert(Bench.classifyValidity(1.03) === "clean")
    assert(Bench.classifyValidity(1.29) === "clean")
    assert(Bench.classifyValidity(1.3) === "contended")
    assert(Bench.classifyValidity(1.341) === "contended")
    assert(Bench.classifyValidity(7.7) === "contended")
    assert(Bench.classifyValidity(-1.0) === "contended") // failed sweeps
  }

  test("driver tail capture: last line of the final 2000 chars parses") {
    val results = mkResults(135, 0.73)
    val compact = headline(results)
    // Model the REAL sbt invocation, not an idealized one: sbt's own lines
    // carry the `[info] ` logger prefix, and for 9 rounds the forked run's
    // stdout did too (the reason every BENCH_r{1..9}.json was
    // `parsed: null`). With `run / outputStrategy := Some(StdoutOutput)`
    // the run's lines pass through raw while sbt's own stay prefixed —
    // this capture replays exactly that shape, so the spec fails by name
    // if the prefix ever reattaches to the headline.
    val stdout = "[info] running (fork) graft.Bench \n" +
      "[info] " + ("x" * 25000) + "\n" + compact + "\n"
    val tail = stdout.takeRight(2000)
    val last = tail.split("\n").last
    assert(!last.startsWith("[info]"),
      "headline must reach the driver un-prefixed (StdoutOutput)")
    val node = mapper.readTree(last)
    assert(node.get("metric").asText() === "total")
    assert(node.get("value").asDouble() > 0)
    assert(node.get("value_operator_graded").asDouble() > 0)
    assert(node.get("bench_validity").asText() === "clean")
  }

  test("build.sbt pins the two tail-safety settings (showSuccess off, " +
    "forked-run stdout unlogged)") {
    // The settings live in build.sbt, outside compiled code — grep-gate
    // them so a build refactor that drops either fails here by name
    // instead of as a 10th consecutive `parsed: null` artifact.
    val sbt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("build.sbt")), "UTF-8")
    assert(sbt.contains("Global / showSuccess := false"))
    assert(sbt.contains("run / outputStrategy := Some(StdoutOutput)"))
  }

  test("operator-graded total substitutes the scale twins") {
    val results = Seq("q_sim_neardup" -> 8.0, "q_sim_clusters" -> 4.0,
      "q_other" -> 1.0)
    val subs = Seq("q_sim_neardup_operator" -> 1.0,
      "q_sim_clusters_x1_operator" -> 3.0)
    // 8→1, 4→3, 1 stays: 5.0
    assert(Bench.operatorGradedTotal(results, subs) === 5.0)
    // a FAILED twin must not substitute (nor subtract): declared time kept
    assert(Bench.operatorGradedTotal(results,
      Seq("q_sim_neardup_operator" -> -1.0)) === 13.0)
    // a FAILED declared query must stay excluded, never replaced by its
    // healthy twin: 8→1, q_sim_clusters failed and drops out, 1 stays
    assert(Bench.operatorGradedTotal(
      Seq("q_sim_neardup" -> 8.0, "q_sim_clusters" -> -1.0, "q_other" -> 1.0),
      subs) === 2.0)
  }

  test("every operator-graded substitution key is a live subtiming name") {
    val spark = SparkSpec.session
    val declared = SparkEntry.orderedQueryNames.toSet
    val twins = graft.queries.ExtQueries.operatorOnly.keySet.map(_ + "_operator")
    Bench.operatorSubs.foreach { case (q, twin) =>
      assert(declared.contains(q), s"substituted query $q is not declared")
      assert(twins.contains(twin), s"twin $twin has no operatorOnly builder")
    }
    assert(spark != null) // touch the lazy session so the suite shape is uniform
  }

  test("every operatorOnly sub-timing builder executes (a broken twin " +
    "would otherwise report -1 silently every round)") {
    val spark = SparkSpec.session
    val dir = "/root/testdata/sf0.001"
    graft.queries.ExtQueries.operatorOnly.foreach { case (name, fn) =>
      val n = fn(spark, dir).count()
      assert(n >= 0, s"$name returned a negative count")
    }
  }

  test("regression tripwire: ratio, spread, and floor rules") {
    val committed = Map("q_real" -> 1.0, "q_noisy" -> 3.5, "q_small" -> 0.1,
      "q_ok" -> 2.0)
    val results = Seq(
      "q_real" -> 2.0,   // 2.0× with tight spread → flagged
      "q_noisy" -> 5.1,  // r8's q_dedup_canonical shape: move 1.6 < spread 7.3
      "q_small" -> 0.25, // 2.5× but move 0.15 under the 0.3 s floor
      "q_ok" -> 2.4,     // 1.2× → under the ratio gate
      "q_new" -> 9.0)    // no baseline → never flagged
    val spreads = Seq("q_real" -> 0.2, "q_noisy" -> 7.3, "q_small" -> 0.01,
      "q_ok" -> 0.3, "q_new" -> 0.1)
    val found = Bench.findRegressions(results, spreads, committed)
    assert(found === Seq(("q_real", 2.0, 1.0)))
  }

  test("committed median snapshot loads and matches the declared inventory") {
    val (sf, medians) = Bench.loadCommittedMedians()
      .getOrElse(fail("bench_medians.tsv resource missing"))
    assert(sf === "sf0.1")
    assert(medians.nonEmpty)
    // operator sub-timings are first-class tripwire rows since r11
    // (VERDICT r10 #2): their suffixed names are valid snapshot keys
    val declared = SparkEntry.orderedQueryNames.toSet ++
      graft.queries.ExtQueries.operatorOnly.keySet.map(_ + "_operator")
    val stale = medians.keySet.diff(declared)
    assert(stale.isEmpty,
      s"snapshot has medians for undeclared queries (regen it): $stale")
    medians.values.foreach(v => assert(v > 0))
  }

  test("per-SF snapshot resolution (r12, VERDICT r11 #4): an sf1 run loads " +
    "the sf1 snapshot, other SFs fall back to the default") {
    val (sf1, m1) = Bench.loadCommittedMedians("sf1")
      .getOrElse(fail("bench_medians_sf1.tsv resource missing"))
    assert(sf1 === "sf1", "the sf1 run must resolve its OWN snapshot, so " +
      "the regression tripwire compares sf1 medians against sf1 medians")
    assert(m1.nonEmpty)
    val declared = SparkEntry.orderedQueryNames.toSet ++
      graft.queries.ExtQueries.operatorOnly.keySet.map(_ + "_operator")
    val stale = m1.keySet.diff(declared)
    assert(stale.isEmpty, s"sf1 snapshot has undeclared names: $stale")
    m1.values.foreach(v => assert(v > 0))
    // an SF with no specific snapshot falls back to the default resource —
    // whose header then mismatches the run and skips the tripwire cleanly
    assert(Bench.loadCommittedMedians("sf0.001").map(_._1) === Some("sf0.1"))
  }
}
