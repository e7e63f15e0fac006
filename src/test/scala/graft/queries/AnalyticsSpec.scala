package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Plan-shape gates for the advanced-analytics queries: the banded self-join
  * must stay an equi-join (never a cartesian), grouped top-k must pre-prune
  * below the shuffle (WindowGroupLimit), and CUBE must be one aggregate.
  * Value-level correctness is each query's DuckDB oracle; here the banded
  * join is additionally cross-checked against the naive theta-join on the
  * same data, proving the bucket trick finds exactly the same pairs.
  */
class AnalyticsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def executed(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect()
    (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p: SparkPlan => p
    }).toString
  }

  test("q_event_pairs: banded self-join plans as an equi-join, never cartesian") {
    val p = executed("q_event_pairs")
    assert(!p.contains("Cartesian") && !p.contains("BroadcastNestedLoop"),
      s"banded join degenerated to a product:\n$p")
    assert(p.contains("Join"), s"expected a hash/merge equi-join:\n$p")
  }

  test("q_event_pairs: bucket trick == naive theta-join (same pairs, exactly)") {
    import spark.implicits._
    val e = graft.Tables.load(spark, sf, "events")
      .select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"))
    val naive = e.as("a").join(e.as("b"),
        $"a.user_id" === $"b.user_id" &&
          ($"b.ts_us" - $"a.ts_us").between(0, 300000000L) &&
          ($"a.ts_us" < $"b.ts_us" ||
            ($"a.ts_us" === $"b.ts_us" && $"a.event_id" < $"b.event_id")))
      .select($"a.user_id", $"a.event_id".as("id_a"), $"b.event_id".as("id_b"),
        ($"b.ts_us" - $"a.ts_us").as("dt_us"))
    val bucketed = SparkEntry.queries("q_event_pairs")(spark, sf)
    assert(bucketed.exceptAll(naive).isEmpty && naive.exceptAll(bucketed).isEmpty,
      "bucketed pair set differs from naive theta-join")
  }

  test("q_topk_group: rank<=k pre-prunes below the shuffle (WindowGroupLimit)") {
    val p = executed("q_topk_group")
    assert(p.contains("WindowGroupLimit"),
      s"top-k per group did not plan a group-limit pushdown:\n$p")
  }

  test("q_cube: all grouping sets in ONE aggregate pass (Expand, single scan)") {
    val p = executed("q_cube")
    assert(p.contains("Expand"), s"CUBE should expand grouping sets:\n$p")
    val scans = p.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"CUBE must read lineitem once, saw $scans scans:\n$p")
  }

  test("q_tfidf: top-5 cut pre-prunes below the shuffle (WindowGroupLimit)") {
    val p = executed("q_tfidf")
    assert(p.contains("WindowGroupLimit"),
      s"tf-idf top-5 did not plan a group-limit pushdown:\n$p")
  }

  test("q_funnel_steps / q_dedup_editdist / q_resample_ffill: no cartesian products") {
    for (q <- Seq("q_funnel_steps", "q_dedup_editdist", "q_resample_ffill")) {
      val p = executed(q)
      assert(!p.contains("CartesianProduct"), s"$q planned a cartesian:\n$p")
    }
  }

  test("q_dedup_editdist: tiny candidate pair list broadcasts into the doc joins") {
    val p = executed("q_dedup_editdist")
    assert(p.contains("BroadcastHashJoin"),
      s"pair joins should broadcast the candidate side:\n$p")
  }

  test("q_pivot: one hash aggregate, no per-pivot-value scans") {
    val p = executed("q_pivot")
    val scans = p.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"pivot must read lineitem once, saw $scans:\n$p")
  }

  test("session_window boundary lock: exactly-gap-apart events MERGE, " +
    "one microsecond more splits") {
    // the q_session_window oracle encodes break-on->gap; the verify
    // fixtures contain no exact 30-minute gaps, so without this lock a
    // boundary regression (in the oracle OR a Spark upgrade changing the
    // merge rule) would keep hash-matching by luck
    import spark.implicits._
    import org.apache.spark.sql.functions.{session_window => sw}
    val gapUs = 1800000000L
    def sessions(ts2: Long): Array[(Long, Long, Long)] = Seq(
        (1L, java.sql.Timestamp.from(java.time.Instant.EPOCH)),
        (1L, java.sql.Timestamp.from(java.time.Instant.EPOCH.plusNanos(ts2 * 1000))))
      .toDF("user_id", "ts")
      .groupBy($"user_id", sw($"ts", "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros($"session_window.start"),
        unix_micros($"session_window.end"), $"n")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // Δt == gap: ONE merged session spanning both events
    assert(sessions(gapUs).toSeq == Seq((0L, 2L * gapUs, 2L)),
      "events exactly gap apart must merge into one session")
    // Δt == gap + 1µs: TWO sessions
    assert(sessions(gapUs + 1).sortBy(_._1).toSeq ==
      Seq((0L, gapUs, 1L), (gapUs + 1, 2L * gapUs + 1, 1L)),
      "events one microsecond past the gap must split")
  }

  test("q_centroid_margin is sign-consistent with q_centroid_assign: " +
    "positive margin == 1-NN misclassification") {
    val dir = "/root/testdata/sf0.001"
    val assign = graft.SparkEntry.queries("q_centroid_assign")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val margins = graft.SparkEntry.queries("q_centroid_margin")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getDouble(3)))
    assert(margins.nonEmpty && margins.length === assign.size)
    margins.foreach { case (vid, label, hardLabel, margin) =>
      assert(hardLabel != label, s"vec $vid: hard negative is own class")
      // strictly positive margin: another centroid is strictly closer ->
      // the assign query must have marked the vector incorrect; strictly
      // negative: own centroid strictly closest -> correct. (margin == 0
      // resolves by label tie-break; absent from this fixture.)
      if (margin > 0) assert(!assign(vid),
        s"vec $vid: margin $margin > 0 but assign says correct")
      else if (margin < 0) assert(assign(vid),
        s"vec $vid: margin $margin < 0 but assign says incorrect")
    }
    // the fixture must exercise both sides of the boundary
    assert(margins.exists(_._4 > 0) && margins.exists(_._4 < 0),
      "fixture degenerate: all margins on one side")
  }
}
