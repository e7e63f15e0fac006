package graft.operators

import graft.SparkSpec

/** Semantics + plan shape of [[AsOf.joinAsOf]] on hand-built cases whose
  * expected matches are derivable by eye (the sf-scale differential proof is
  * q_asof_join's DuckDB ASOF JOIN oracle).
  */
class AsOfSpec extends SparkSpec {

  import spark.implicits._

  // left: (key, ts, lbl) / right: (key, ts, px, note)
  private lazy val left = Seq(
    ("a", 10L, "l1"), // before any right row -> NULL match
    ("a", 20L, "l2"), // exactly at right ts 20 -> inclusive match
    ("a", 35L, "l3"), // between 30 and 40 -> 30
    ("b", 99L, "l4"), // key with no right rows at all -> NULL
    ("c", 50L, "l5")  // right row has NULL px: must still match ts 40, not leak older
  ).toDF("k", "t", "lbl")

  private lazy val right = Seq(
    ("a", 20L, Some(200), "r20"),
    ("a", 30L, Some(300), "r30"),
    ("a", 40L, Some(400), "r40"),
    ("c", 10L, Some(111), "c10"),
    ("c", 40L, None, "c40")
  ).toDF("k", "t", "px", "note")

  private lazy val result =
    AsOf.joinAsOf(left, right, key = "k", ts = "t",
        carryCols = Seq("px", "note"))
      .collect().map(r => r.getAs[String]("lbl") -> r).toMap

  test("row before any right match carries NULLs") {
    val r = result("l1")
    assert(r.isNullAt(r.fieldIndex("t_right")) && r.isNullAt(r.fieldIndex("px")))
  }

  test("match at identical ts is inclusive (>=, DuckDB ASOF semantics)") {
    val r = result("l2")
    assert(r.getAs[Long]("t_right") == 20L && r.getAs[Int]("px") == 200)
  }

  test("picks the most recent right row, not just any earlier one") {
    val r = result("l3")
    assert(r.getAs[Long]("t_right") == 30L && r.getAs[Int]("px") == 300)
  }

  test("key absent from right side yields NULL match, row preserved") {
    val r = result("l4")
    assert(r.isNullAt(r.fieldIndex("t_right")))
  }

  test("NULL in a carried column does NOT leak through to an older right row") {
    // the struct travels atomically: l5 must match right (c, 40) whose px is
    // NULL — a per-column last(ignoreNulls) would wrongly surface px=111
    // from (c, 10) while note said c40
    val r = result("l5")
    assert(r.getAs[Long]("t_right") == 40L)
    assert(r.isNullAt(r.fieldIndex("px")))
    assert(r.getAs[String]("note") == "c40")
  }

  test("carry-column name colliding with a left column fails fast") {
    val ex = intercept[IllegalArgumentException] {
      AsOf.joinAsOf(left, right.withColumnRenamed("px", "lbl"), "k", "t", Seq("lbl"))
    }
    assert(ex.getMessage.contains("lbl"))
  }

  test("intervalJoin matches the brute-force range join exactly and never " +
    "plans a loop join") {
    import org.apache.spark.sql.functions._
    // intervals spanning 0-3 buckets (width 10), half-open boundaries,
    // an empty interval, and a cross-key decoy at matching times
    val points = Seq(
      (1L, 0L), (1L, 9L), (1L, 10L), (1L, 19L), (1L, 20L), (1L, 35L),
      (2L, 10L))
      .toDF("k", "pt")
    val intervals = Seq(
      (1L, 100L, 0L, 10L),   // [0,10): catches 0,9 — not 10
      (1L, 101L, 5L, 32L),   // spans 3 buckets: 5..31
      (1L, 102L, 35L, 35L),  // empty: drops
      (1L, 103L, 30L, 40L),  // catches 35
      (2L, 200L, 0L, 40L))   // key 2 only sees its own point
      .toDF("k", "iid", "s", "e")
    val got = AsOf.intervalJoin(points, intervals, "pt", "s", "e",
      bucketWidth = 10L, keyCols = Seq("k"))
    val gotSet = got.select("iid", "pt").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = intervals.as("i").join(points.as("p"),
        col("i.k") === col("p.k") &&
          col("p.pt") >= col("i.s") && col("p.pt") < col("i.e"))
      .select(col("i.iid"), col("p.pt")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotSet === brute)
    assert(gotSet === Set((100L, 0L), (100L, 9L),
      (101L, 9L), (101L, 10L), (101L, 19L), (101L, 20L),
      (103L, 35L), (200L, 10L)))
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"interval join must stay an equi-join:\n$plan")
  }

  test("plan: exactly one shuffle, no join operator, no row amplification") {
    val df = AsOf.joinAsOf(left, right, "k", "t", Seq("px"))
    df.collect()   // drive AQE to its final plan
    // AQE renders the plan twice (final + initial); count the final only
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val shuffles = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(shuffles == 1, s"expected 1 shuffle:\n$plan")
    assert(!plan.toLowerCase.contains("join"),
      s"as-of must not plan a join operator:\n$plan")
  }
}
