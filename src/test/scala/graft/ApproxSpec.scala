package graft

import org.apache.spark.sql.functions._

/** approx_count_distinct (HLL++) must stay within its error bound against
  * the exact count on real testdata — the check the rows-only harness
  * can't perform.
  */
class ApproxSpec extends SparkSpec {

  test("q_approx_distinct estimates within 5% of exact counts") {
    // the 5% bound is now computed IN the query (property-oracle flags the
    // driver hash-checks against literal TRUE); this test proves the flags
    // hold on real data and the exact side is non-degenerate
    val r = SparkEntry.queries("q_approx_distinct")(spark, "/root/testdata/sf0.001").head()
    val (exactParts, exactOrders) = (r.getLong(0), r.getLong(1))
    assert(exactParts > 0 && exactOrders > 0)
    assert(r.getBoolean(2), s"parts flag false: exact $exactParts")
    assert(r.getBoolean(3), s"orders flag false: exact $exactOrders")
  }

  test("approx_percentile lands within the declared rank-error bound of exact") {
    import spark.implicits._
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val n = li.count()
    val acc = 100  // rank error <= 1/acc of the row count
    for (p <- Seq(0.5, 0.9, 0.99)) {
      val approx = li.select(percentile_approx($"l_extendedprice", lit(p), lit(acc)))
        .head().getDouble(0)
      // rank of the approx answer must be within n/acc of the target rank
      val rank = li.where($"l_extendedprice" <= approx).count()
      val err = math.abs(rank - p * n)
      assert(err <= n.toDouble / acc + 1,
        s"p=$p: approx value $approx has rank $rank, target ${p * n}, err $err")
    }
  }

  test("count-min sketch estimates bound the exact heavy-hitter counts") {
    // exact <= est is a STRUCTURAL CMS guarantee; est <= exact + eps*N
    // holds per query only with confidence 0.99, so over 20 tokens the
    // spec-compliant expectation is <= 1 violation. Both checks now live
    // in the query's single bounds_ok flag (property-oracled against
    // literal TRUE by the driver); this test proves the flag holds on
    // real data and the ground-truth side is non-degenerate.
    val rows = SparkEntry.queries("q_heavy_hitters_sketch")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 20, "expected the exact top-20 ground truth")
    rows.foreach { r =>
      assert(r.getLong(1) > 0, s"degenerate exact count for '${r.getString(0)}'")
      assert(r.getBoolean(2),
        "CMS bounds flag false: an estimate underestimated its exact count " +
          "or >1 of 20 tokens exceeded exact + eps*N")
    }
  }

  test("q_quantile_sketch flags hold on real data and the rank gate is " +
    "tight enough to catch a collapsed sketch") {
    import spark.implicits._
    val rows = SparkEntry.queries("q_quantile_sketch")(
      spark, "/root/testdata/sf0.001").collect()
    // 4 quantiles per event type, every flag true, non-degenerate counts
    assert(rows.length % 4 == 0 && rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) > 0, s"degenerate n for ${r.getString(0)}")
      assert(r.getBoolean(3), s"rank flag false at q=${r.getDouble(1)} " +
        s"for ${r.getString(0)}")
    }
    // negative control: a sketch collapsed to the per-type MINIMUM value
    // must fail the same gate at every q (proves the flag is load-bearing,
    // not vacuously true at this data size)
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select($"event_type", $"value").where($"value".isNotNull)
    val broken = ev.groupBy($"event_type")
      .agg(min($"value").as("v"), count($"value").as("n_values"))
    val acc = 10000
    val checked = ev.join(broadcast(broken), "event_type")
      .groupBy($"event_type", $"n_values", $"v")
      .agg(sum(when($"value" <= $"v", 1L).otherwise(0L)).as("cnt_le"))
      .select(($"cnt_le".cast("double") >=
        lit(0.25) * $"n_values".cast("double")
          - (lit(2.0 / acc) * $"n_values".cast("double") + lit(1.0)))
        .as("rank_ok"))
      .collect()
    assert(checked.nonEmpty && checked.forall(!_.getBoolean(0)),
      "min-collapsed sketch passed the q=0.25 rank gate — gate too loose")
  }

  test("rollup emits per-month rows, per-year subtotals, and a grand total") {
    val df = SparkEntry.queries("q_rollup")(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    val years = rows.filter(r => !r.isNullAt(0) && r.isNullAt(1))
    val months = rows.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
    assert(grand.length === 1)
    assert(years.nonEmpty && months.nonEmpty)
    // counts are additive up the hierarchy
    assert(grand.head.getLong(2) === years.map(_.getLong(2)).sum)
    assert(grand.head.getLong(2) === months.map(_.getLong(2)).sum)
  }
}
