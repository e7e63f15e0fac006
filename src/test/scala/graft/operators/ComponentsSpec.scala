package graft.operators

import graft.SparkSpec

/** Semantics of [[Components.connectedComponents]] on graphs whose
  * components are derivable by eye (sf-scale differential proof:
  * q_dedup_clusters' DuckDB recursive-CTE oracle).
  */
class ComponentsSpec extends SparkSpec {

  import spark.implicits._

  private def comps(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(
        nodes.toDF("id"), "id", edges.toDF("s", "d"), "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain collapses transitively: a-b, b-c, c-d all reach min") {
    // diameter 3 — takes >1 propagation round, exercises the loop
    val m = comps(Seq(1L, 2L, 3L, 4L), Seq((4L, 3L), (2L, 1L), (3L, 2L)))
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("isolated nodes are their own singleton component") {
    val m = comps(Seq(10L, 20L, 30L), Seq((10L, 20L)))
    assert(m == Map(10L -> 10L, 20L -> 10L, 30L -> 30L))
  }

  test("two separate components do not merge") {
    val m = comps(Seq(1L, 2L, 7L, 8L, 9L), Seq((1L, 2L), (9L, 7L), (8L, 9L)))
    assert(m == Map(1L -> 1L, 2L -> 1L, 7L -> 7L, 8L -> 7L, 9L -> 7L))
  }

  test("empty node set returns an empty result (sum-over-zero-rows guard)") {
    val out = Components.connectedComponents(
      Seq.empty[Long].toDF("id"), "id",
      Seq.empty[(Long, Long)].toDF("s", "d"), "s", "d")
    assert(out.count() == 0)
  }

  /** Force the distributed star loop for legs that pin ITS behavior —
    * fixture graphs sit far under the small-graph driver-path bound.
    */
  private def forcingLoop[T](f: => T): T = {
    spark.conf.set("spark.graft.cc.maxLocalEdges", "0")
    try f finally spark.conf.unset("spark.graft.cc.maxLocalEdges")
  }

  test("iteration checkpoints are released round-over-round (flat memory)") {
    forcingLoop {
      // a 14-node path has diameter 13 → ~13 propagation rounds; without the
      // per-round release every round's label snapshot stays persisted
      val n = 14L
      val nodes = (0L until n)
      val edges = (0L until n - 1).map(i => (i, i + 1))
      val before = spark.sparkContext.getPersistentRDDs.size
      val m = comps(nodes, edges)
      assert(m.values.toSet == Set(0L), "path must collapse to one component")
      val after = spark.sparkContext.getPersistentRDDs.size
      // only the FINAL labels checkpoint (the returned result) may remain —
      // one snapshot, not one per iteration
      assert(after - before <= 1,
        s"checkpoint blocks accreted across iterations: $before -> $after")
    }
  }

  test("small-graph driver path (union-find) labels equal the star loop's " +
    "and leave no persisted edge snapshot behind") {
    // deterministic pseudo-random graph: chains, a star, isolated nodes,
    // duplicate-ish edges via modulus collisions — both paths must agree
    // on every label (component = min reachable id)
    val nodes = (0L until 60L)
    val edges = (0L until 90L).map(i => ((i * 7) % 60, (i * 13 + 5) % 60))
      .filter { case (a, b) => a != b }
    val before = spark.sparkContext.getPersistentRDDs.size
    val viaDriver = comps(nodes, edges) // default bound ≫ 90 edges
    val after = spark.sparkContext.getPersistentRDDs.size
    val viaLoop = forcingLoop(comps(nodes, edges))
    assert(viaDriver == viaLoop,
      s"driver union-find diverged from star loop:\n$viaDriver\nvs\n$viaLoop")
    // the driver path releases the edge checkpoint it collected from;
    // unpersist is async (blocking=false) and earlier tests' releases can
    // also land during this one, so assert no ACCRETION rather than an
    // exact count
    assert(after - before <= 1,
      s"driver path leaked persisted snapshots: $before -> $after")
  }

  test("edge endpoints absent from the node list still resolve via nodes given") {
    // hub-and-spoke (star): one round to converge, any listing order
    val m = comps(Seq(5L, 6L, 7L, 8L), Seq((7L, 5L), (5L, 8L), (6L, 5L)))
    assert(m.values.toSet == Set(5L))
  }

  test("out-of-universe edges never bridge components nor leak foreign ids") {
    // 9 is NOT in the node universe: edges (1,9) and (9,2) must not merge
    // 1 and 2 through the undeclared bridge, and no returned component id
    // may be an id absent from nodes
    val m = comps(Seq(1L, 2L, 3L), Seq((1L, 9L), (9L, 2L), (2L, 3L)))
    assert(m == Map(1L -> 1L, 2L -> 2L, 3L -> 2L),
      s"out-of-universe endpoint changed labels: $m")
  }

  test("diameter-13 chain converges in O(log n) rounds, not O(diameter)") {
    forcingLoop {
      // the Kiveris large-star/small-star guarantee: each round halves path
      // lengths in the pointer forest, so a 14-node path (diameter 13, which
      // plain min-label propagation needs ~13 rounds for) must finish in a
      // logarithmic number of rounds (+1 to detect the fixpoint)
      val n = 14L
      val (df, rounds) = Components.connectedComponentsWithRounds(
        (0L until n).toDF("id"), "id",
        (0L until n - 1).map(i => (i, i + 1)).toDF("s", "d"), "s", "d")
      val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(m.values.toSet == Set(0L), "path must collapse to one component")
      assert(rounds > 0 && rounds <= 7,
        s"expected the loop to run in O(log 14) ≈ 1..7 rounds, took $rounds")
    }
  }

  test("degree-ordered triangle count equals the id orientation, and the " +
    "star hub sources no edges") {
    import spark.implicits._
    // hub 1 (low id, degree 12) with spokes 2..13, hub-closing edge (2,3),
    // a spoke-external triangle leg (2,14),(3,14), and a detached triangle
    // (15,16,17) → exactly {1,2,3}, {2,3,14}, {15,16,17} — a shape where
    // the id orientation makes the hub source everything
    val spokes = (2L to 13L).map(s => (1L, s))
    val extra = Seq((2L, 3L), (2L, 14L), (3L, 14L),
      (15L, 16L), (15L, 17L), (16L, 17L))
    val pairs = (spokes ++ extra).toDF("a", "b")
    val dg = Components.degreeOf(pairs, "a", "b")
    val got = Components.countTriangles(pairs, "a", "b", dg)
      .head().getLong(0)
    // id-orientation truth (pairs are already a<b): the oracle's join
    val e = pairs
    val idTri = e.select($"a".as("x"), $"b".as("y"))
      .join(e.select($"a".as("y"), $"b".as("z")), Seq("y"))
      .join(e.select($"a".as("x"), $"b".as("z")), Seq("x", "z"))
      .count()
    assert(got == 3L && got == idTri,
      s"degree-ordered $got vs id-ordered $idTri")
    // the skew property itself: hub 1 has max degree, so it never
    // appears as a source under (deg, id) orientation — no task ever
    // builds the hub's wedge cross product
    val srcs = Components.orientByDegree(pairs, "a", "b", dg)
      .groupBy($"src").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!srcs.contains(1L), s"hub sourced edges: $srcs")
    // and out-degrees stay within the sqrt(2|E|) node-iterator bound
    val bound = math.sqrt(2.0 * pairs.count()).ceil.toLong
    assert(srcs.values.forall(_ <= bound), s"out-degree bound broken: $srcs")
  }
}
