package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // UTC parity with Verify/SparkSpec: Tables.load's TIMESTAMP_NTZ cast is
      // timezone-dependent, so a non-UTC host would bench (and plan-hash)
      // subtly different plans than the correctness sessions
      .config("spark.sql.session.timeZone", "UTC")
      // the PRODUCTION extension wiring: this is the first session of the
      // JVM, so the config string drives Spark's reflective applyExtensions
      // -> GraftExtensions.apply(injectFunction) — the injector path itself,
      // not the imperative register() fallback for pre-built sessions
      .config("spark.sql.extensions", "graft.extensions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: absorb one-time JVM/codegen/parquet-reader init so the
    // first timed query measures the query, not session bring-up.
    Tables.load(spark, sfDir, "lineitem").limit(1000)
      .groupBy("l_returnflag").count().count()

    def runOne(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        name: String): Double = {
      val t0 = System.nanoTime()
      // noop sink, not count(): count() lets Catalyst prune projection-only
      // work, timing a select-heavy query as a bare row count
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9 }
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          // a failed query must not masquerade as a fast one
          -1.0
      }
    }
    def sweep(): Seq[(String, Double)] =
      // declaration order, not Map hash order: build-then-probe pairs
      // (q_sim_ivf_build → q_sim_ivf) must run build first, and per-round
      // comparisons shouldn't be scrambled by hashing
      SparkEntry.orderedQueryNames.map { name =>
        name -> runOne(SparkEntry.queries(name), name)
      }
    // Three full sweeps, keep the per-query MEDIAN: the ~15% run-to-run
    // container noise documented in r3/r4 makes single-shot sub-second
    // timings unreadable, and a transient contention burst during one sweep
    // (round 2: untouched queries "slowed" 2–6×) cannot masquerade as a
    // plan regression — the median ignores one bad sweep entirely. A query
    // that failed in ANY sweep stays failed (-1): the median must not let
    // two lucky sweeps hide flakiness. Per-query spread (max−min over the
    // three) is recorded alongside so a reader can judge each timing's
    // noise floor.
    val sweeps = Seq(sweep(), sweep(), sweep())
    def median3(a: Double, b: Double, c: Double): Double =
      Seq(a, b, c).sorted.apply(1)
    val results = SparkEntry.orderedQueryNames.zipWithIndex.map { case (name, i) =>
      val ts = sweeps.map(_(i)._2)
      name -> (if (ts.exists(_ < 0)) -1.0 else median3(ts(0), ts(1), ts(2)))
    }
    val spreads = SparkEntry.orderedQueryNames.zipWithIndex.map { case (name, i) =>
      val ts = sweeps.map(_(i)._2)
      name -> (if (ts.exists(_ < 0)) -1.0 else ts.max - ts.min)
    }

    // Operator-only sub-timings for the property-oracled queries whose
    // declared form also executes the exact truth side in-plan
    // (q_sim_neardup / q_sim_lsh): bench trends should track the OPERATOR,
    // not the correctness harness riding along in the declared entry.
    // Median-of-3 like the main sweep; keys are suffixed `_operator`.
    val subtimings = graft.queries.ExtQueries.operatorOnly.toSeq
      .sortBy(_._1)
      .map { case (name, fn) =>
        val ts = Seq.fill(3)(runOne(fn, s"${name}_operator"))
        s"${name}_operator" ->
          (if (ts.exists(_ < 0)) -1.0 else median3(ts(0), ts(1), ts(2)))
      }

    // Canonicalized physical-plan fingerprint per query (PlanHash): the
    // self-recorded half of the plan-drift tripwire (PlanHashSpec gates the
    // committed snapshot; this makes drift visible in artifact history).
    // Build-only — never executes the query.
    val planHashes = SparkEntry.orderedQueryNames.map { name =>
      val h =
        try PlanHash.hash(SparkEntry.queries(name)(spark, sfDir))
        catch { case _: Throwable => "build-failed" }
      name -> h
    }

    def jmap(kvs: Seq[(String, Any)]): String =
      kvs.map { case (k, v) =>
        JsonOut.quote(k) + ":" + (v match {
          case s: String => JsonOut.quote(s)
          case x => x.toString
        })
      }.mkString("{", ",", "}")
    // failures are excluded from the headline (their -1 sentinel must not
    // SUBTRACT time and make a broken build look faster)
    val total = results.map(_._2).filter(_ >= 0).sum
    def sweepTotal(s: Seq[(String, Double)]) = s.map(_._2).filter(_ >= 0).sum
    // Bench-validity flag: identical work three times should produce nearly
    // identical sweep totals; a max/min ratio over 1.5 means the container
    // was contended during at least one sweep and medians inherit the
    // second-worst sweep — readers should discount regressions accordingly
    // (round 6: sweeps of 1462s/190s/461s inflated most medians 2-4x).
    val sweepTotals = sweeps.map(sweepTotal)
    val dispersion =
      if (sweepTotals.min > 0) sweepTotals.max / sweepTotals.min else -1.0
    val validity = if (dispersion > 0 && dispersion <= 1.5) "clean" else "contended"
    val json = s"""{"metric":"total","value":$total,"unit":"sec"""" +
      s""","queries":${jmap(results)}""" +
      s""","spread":${jmap(spreads)}""" +
      s""","subtimings":${jmap(subtimings)}""" +
      s""","plan_hashes":${jmap(planHashes)}""" +
      s""","sweep_totals":[${sweepTotals.mkString(",")}]""" +
      s""","sweep_dispersion":$dispersion""" +
      s""","bench_validity":${JsonOut.quote(validity)}""" +
      s""","sf":${JsonOut.quote(sfDir)}}"""
    println(json)
    // The driver records only the LAST 2000 chars of stdout (every
    // BENCH_r{N}.json so far: tail_len=2000, parsed=None — the full line
    // above is ~25 KB, so its head is always cut and the driver has never
    // parsed a bench line). Print a compact headline line LAST so the tail
    // window holds one COMPLETE parsable JSON object: totals, validity,
    // failures by name, the slowest queries, and the operator sub-timings
    // (the graded scale-growth twins). Full per-query record stays in the
    // big line + the self-recorded file.
    def r3(x: Double): Double = math.rint(x * 1000) / 1000
    val failedNames = results.filter(_._2 < 0).map(_._1)
    val slowest = results.filter(_._2 >= 0).sortBy(-_._2).take(12)
      .map { case (n, t) => n -> r3(t) }
    val compact = s"""{"metric":"total","value":${r3(total)},"unit":"sec"""" +
      s""","n_queries":${results.size}""" +
      s""","n_failed":${failedNames.size}""" +
      s""","failed":[${failedNames.map(JsonOut.quote).mkString(",")}]""" +
      s""","sweep_totals":[${sweepTotals.map(r3).mkString(",")}]""" +
      s""","sweep_dispersion":${r3(dispersion)}""" +
      s""","bench_validity":${JsonOut.quote(validity)}""" +
      s""","slowest":${jmap(slowest)}""" +
      s""","subtimings":${jmap(subtimings.map { case (n, t) => n -> r3(t) })}""" +
      s""","full_record":"target/bench.json"""" +
      s""","sf":${JsonOut.quote(sfDir)}}"""
    println(compact)
    // Also self-record to a file: a stdout tail capture can truncate
    // mid-JSON (round 3's BENCH artifact lost its first 16 queries), and
    // this file is then the surviving full record. Best-effort — a
    // read-only target dir must not fail the bench itself.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench.json")
    try {
      val p = java.nio.file.Paths.get(outPath)
      Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.write(p, (json + "\n").getBytes("UTF-8"))
    } catch {
      case e: Exception =>
        System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    spark.stop()
  }
}
