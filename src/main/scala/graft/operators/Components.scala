package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the clustering step
  * that turns near-dup PAIRS (MinHash / Jaccard / winnow / embedding) into
  * dedup DECISIONS: every document in a component keeps one canonical
  * representative (min id) and drops the rest. Without this step a pair list
  * under-deletes: A~B and B~C leaves A,C both "kept" even though they are
  * transitively duplicates.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC 2014) — the
  * published replacement for plain min-label propagation:
  *
  *   - '''large-star''' — per node u with (undirected) neighborhood Γ(u)
  *     and m = min(Γ(u) ∪ {u}): emit edge (v, m) for every v ∈ Γ(u), v > u.
  *     Strictly-larger neighbors shortcut directly to the local minimum.
  *   - '''small-star''' — edges are now (child, parent) with parent < child;
  *     per node u with smaller-neighbors N⁻(u) and m = min(N⁻(u) ∪ {u}):
  *     emit (u, m) and (v, m) for every v ∈ N⁻(u), v ≠ m.
  *
  * Each round halves path lengths in the pointer forest, so the loop
  * converges in '''O(log n) rounds''' instead of label propagation's
  * O(component diameter) — the distinction that matters when a 100 TB dedup
  * graph contains a long chain (transcription chains, rolling-boilerplate
  * families) rather than the shallow hub-and-spoke clusters near-dup usually
  * produces. Both stars also bound hub growth: a node's emitted degree never
  * exceeds its current degree, and every emission points AT a local minimum
  * (the pointer-doubling edges collapse, never fan out).
  *
  * Each round is two (groupBy min + join-back) passes — min is a cheap
  * partial aggregate, so map-side combine flattens skewed hubs before the
  * shuffle, and the join back re-uses the same hash partitioning.
  * Convergence: the edge multiset reaches a fixpoint (per-component star
  * graphs rooted at the min), detected with one action per round on
  * (count, Σ xxhash64(a,b)) — an order-independent multiset checksum, exact
  * up to a 2⁻⁶⁴ hash-sum collision, without joining consecutive rounds.
  *
  * Scale notes: the driver loop is pure orchestration (one two-scalar action
  * per round — no row data on the driver). Each round's edge set is
  * `localCheckpoint`ed: this truncates the growing lineage (an O(rounds)-deep
  * plan would otherwise re-execute EVERY prior join each action) at the cost
  * of materializing |E| rows per round — the same trade GraphX makes — and
  * the previous round's blocks are released as soon as the next round has
  * materialized.
  */
object Components {

  /** One large-star pass: strictly-larger neighbors of every node link to
    * that node's neighborhood minimum. Input orientation is irrelevant (the
    * undirected view is built here); output edges satisfy parent < child.
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val und = e.union(e.select(col("b").as("a"), col("a").as("b")))
    val m = und.groupBy(col("a"))
      .agg(least(col("a"), min(col("b"))).as("mn"))
    und.join(m, "a")
      .where(col("b") > col("a"))
      .select(col("b").as("a"), col("mn").as("b"))
      .distinct()
  }

  /** One small-star pass over (child, parent) edges (parent < child): every
    * node and its smaller neighbors link to the minimum of that set.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val m = e.groupBy(col("a")).agg(min(col("b")).as("mn"))
    val nbrs = e.join(m, "a")
      .where(col("b") =!= col("mn"))
      .select(col("b").as("a"), col("mn").as("b"))
    val self = m.select(col("a"), col("mn").as("b"))
    nbrs.union(self).distinct()
  }

  /** @param nodes  node universe; isolated nodes become their own component
    * @param idCol  node id column in `nodes` (castable to long)
    * @param edges  undirected edge list (each pair listed once, either order)
    * @param srcCol edge endpoint column in `edges`
    * @param dstCol other endpoint column in `edges`
    * @return (`<idCol>`, component) — component = min node id reachable
    */
  def connectedComponents(nodes: DataFrame, idCol: String,
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 20): DataFrame =
    connectedComponentsWithRounds(nodes, idCol, edges, srcCol, dstCol,
      maxIter)._1

  /** Edge-count bound (inclusive) under which the star loop is replaced by
    * a single-pass driver union-find (r16 optimization): the initial
    * convergence checksum already pays one full materialization of the
    * cleaned edge list and returns its EXACT row count, so the decision is
    * free, deterministic in the data, and bounded BEFORE any collect — at
    * the default 200k edges the driver holds ≤ 3.2 MB of edge longs and
    * ships back ≤ 2·|E| (node, component) rows (≤ ~6.4 MB) through a
    * broadcast join, both orders of magnitude under driver/broadcast
    * limits. Rationale: each distributed star round costs 4–6 exchanges
    * regardless of size (measured 0.45–0.85 s/round on 244–648-edge bench
    * graphs — pure scheduling overhead), while union-find with path
    * compression solves 200k edges in single-digit milliseconds; at 100 TB
    * the post-banding dedup graph is far above the bound and takes the
    * unchanged O(log n) star loop (the same small-side-fits escape hatch a
    * broadcast join takes). Override per session with
    * `spark.graft.cc.maxLocalEdges` (0 forces the distributed loop —
    * ComponentsSpec uses that to keep pinning the loop's round count and
    * checkpoint lifecycle on fixture graphs).
    */
  private val defaultMaxLocalEdges = 200000L

  /** Driver-side union-find over a bounded collected edge list: component =
    * min reachable id, exactly the star loop's fixpoint semantics. Path
    * compression + union by attaching the larger root keeps it near-linear;
    * labels for non-isolated nodes ship back as one in-memory relation and
    * isolated nodes label themselves through the caller's left join.
    */
  private def localUnionFind(rows: Array[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) {
        val nxt = parent(c); parent(c) = r; c = nxt
      }
      r
    }
    rows.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      // attach the larger root under the smaller: roots stay the class min,
      // so no second pass is needed to relabel to min-reachable-id
      if (ra < rb) parent(rb) = ra
      else if (rb < ra) parent(ra) = rb
    }
    val touched = rows.iterator.flatMap { case (a, b) => Iterator(a, b) }
    touched.map(n => n -> find(n)).toMap
  }

  /** [[connectedComponents]] plus the number of large+small-star rounds the
    * loop ran (convergence-detection round included) — observable so tests
    * can pin the O(log n) behavior on deep graphs. The small-graph driver
    * path reports 0 rounds.
    */
  def connectedComponentsWithRounds(nodes: DataFrame, idCol: String,
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 20): (DataFrame, Int) = {
    // (count, hash-sum) multiset checksum in ONE action. The hash is summed
    // in decimal: a long sum of 64-bit hashes overflows after a handful of
    // rows, which ANSI mode (the Spark 4 default) turns into a runtime
    // error rather than a wrap. Sum over zero rows is NULL, not 0 — read
    // defensively so an empty edge set converges instead of NPE-ing
    def checksum(df: DataFrame): (Long, BigDecimal) = {
      val r = df.agg(count(lit(1)),
        sum(xxhash64(col("a"), col("b")).cast("decimal(20,0)"))).head()
      (r.getLong(0),
        if (r.isNullAt(1)) BigDecimal(0) else BigDecimal(r.getDecimal(1)))
    }
    // release round i−1's localCheckpoint blocks once round i is
    // materialized: without this every round's |E| edge snapshot stays in
    // block-manager storage until GC. Only safe AFTER the next round's
    // checkpoint has fully materialized (a localCheckpoint'd RDD cannot
    // recompute lost blocks) — the checksum action below guarantees that.
    def releaseCheckpoint(df: DataFrame): Unit =
      df.queryExecution.analyzed.collect {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }.foreach(_.unpersist(blocking = false))

    val universe = nodes.select(col(idCol).cast("long").as("n")).distinct()

    // self-loops carry no connectivity and would survive as (a, a) noise.
    // Edges are also restricted to the node universe: an out-of-universe
    // endpoint would otherwise act as a silent BRIDGE (merging components
    // through a node the caller never declared) and could even surface as
    // the component id itself. Two one-time semi-joins — noise against a
    // 100 TB edge list next to the per-round |E| shuffles of the star loop.
    var e = edges.select(col(srcCol).cast("long").as("a"),
        col(dstCol).cast("long").as("b"))
      .where(col("a") =!= col("b"))
      .join(universe.select(col("n").as("a")), Seq("a"), "left_semi")
      .join(universe.select(col("n").as("b")), Seq("b"), "left_semi")
      .select(col("a"), col("b"))
      .localCheckpoint(false)
    var prev = checksum(e)

    // Scale-adaptive small-graph path: the checksum above already counted
    // the cleaned edge list exactly, so a bounded graph resolves with one
    // driver union-find instead of paying 4–6 exchanges per star round
    // (see [[defaultMaxLocalEdges]]). Same fixpoint semantics (component =
    // min reachable id); isolated nodes fall through the left join below.
    val maxLocal = nodes.sparkSession.conf
      .get("spark.graft.cc.maxLocalEdges", defaultMaxLocalEdges.toString).toLong
    if (prev._1 > 0L && prev._1 <= maxLocal) {
      val sess = nodes.sparkSession
      import sess.implicits._
      // bounded by the count just measured (≤ maxLocal rows of two longs);
      // collected as PRIMITIVE tuples (ADVICE r16 #3) — a Row collect
      // materializes one GenericRow + two boxed longs per edge (tens of MB
      // at the bound), the typed collect is two longs per edge
      val labelMap = localUnionFind(e.as[(Long, Long)].collect())
      releaseCheckpoint(e) // nothing downstream references the edge snapshot
      val labelRel = labelMap.toSeq.toDF("n", "pcomp")
      val labels = universe
        .join(broadcast(labelRel), Seq("n"), "left")
        .select(col("n").as(idCol),
          coalesce(col("pcomp"), col("n")).as("component"))
      return (labels, 0)
    }

    var round = 0
    var converged = prev._1 == 0L // no edges → already a (trivial) fixpoint

    while (round < maxIter && !converged) {
      // lazy checkpoint: the checksum action below is what materializes it —
      // one job per round, not a checkpoint job + a checksum job
      val next = smallStar(largeStar(e)).localCheckpoint(false)
      val s = checksum(next)
      releaseCheckpoint(e)
      converged = s == prev
      prev = s
      e = next
      round += 1
    }

    // at the fixpoint e is a star forest (child, component-min); a node can
    // appear with one parent only, but min() keeps the read defensive if a
    // caller lowers maxIter below convergence
    val parents = e.groupBy(col("a").as("n")).agg(min(col("b")).as("pcomp"))
    val labels = universe
      .join(parents, Seq("n"), "left")
      .select(col("n").as(idCol),
        coalesce(col("pcomp"), col("n")).as("component"))
    (labels, round)
  }

  /** Fixed-iteration simplified PageRank over a directed edge list (pass an
    * undirected graph as both edge directions) — the centrality read on the
    * near-dup graph that the degree histogram can't give: a template hub
    * whose spokes are THEMSELVES well-connected outranks an equal-degree
    * hub of leaf recrawls, which is the difference between "one boilerplate
    * family" and "a copy-farm mesh" when choosing what to canonicalize
    * first. Simplified = the standard r ← (1−d)/n + d·Σ_in r/outdeg update
    * WITHOUT dangling-mass redistribution (isolated docs keep the teleport
    * floor; rank mass is not conserved — fine for RANKING, not for
    * probability semantics), with `teleport` passed as its own literal
    * rather than computed 1−damping (1.0−0.85 in IEEE is not the double
    * nearest 0.15 — a cross-engine differential would chase that phantom).
    *
    * Scale shape: the (src, dst, outdeg) relation and the (id, n) node
    * spine are each anchored on ONE explicit src-/id-keyed exchange — the
    * edge list is usually the output of the whole near-dup candidate
    * pipeline, and `iters` lazy re-executions of it is the plan this
    * method exists to avoid (ReusedExchange dedups every reference; the
    * [[connectedComponents]] trade) — and the anchors double as the
    * co-partitioning that lets each iteration run as ONE dst-keyed
    * partial-agg shuffle (the rank join and the teleport join are
    * exchange-free against the anchored keys). The scalar n rides as a
    * crossJoin'd one-row broadcast. Ranks snap to 1e-9 per iteration so
    * both engines iterate on IDENTICAL values (contribution sums reorder
    * across partitionings; unsnapped drift would compound geometrically
    * through the iterations).
    */
  def pageRank(nodes: DataFrame, idCol: String, edges: DataFrame,
      srcCol: String, dstCol: String, iters: Int,
      damping: Double = 0.85, teleport: Double = 0.15): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters must be in [1, 50], got $iters")
    val snap9 = (x: org.apache.spark.sql.Column) =>
      floor(x * lit(1000000000) + lit(0.5)) / lit(1000000000)
    // pruneGuard (the Dedup.groupPairs convention, r17): the degree branch
    // must read BOTH edge columns like the join branch below, or column
    // pruning rewrites the two copies of the upstream edge pipeline
    // differently and they canonicalize unequal — the whole candidate
    // pipeline would execute once per branch instead of sharing its last
    // exchange. pruneGuard adds exactly 0 to the count.
    val deg = edges.groupBy(col(srcCol).as("src"))
      .agg((count(lit(1)) +
        Dedup.pruneGuard(struct(col(srcCol), col(dstCol)))).as("deg"))
    // Both loop-invariant relations are checkpointed ONCE, repartitioned on
    // their JOIN key, through the partitioning-KEEPING checkpoint (r17,
    // guide §2.4): stock `localCheckpoint` wraps the blocks in a LogicalRDD
    // with UnknownPartitioning, so the r16 shape re-shuffled both relations
    // in EVERY iteration — three exchanges per iteration. With the captured
    // HashPartitioning, every iteration's rank join (ed.src = pr.id, pr
    // inheriting base's id-partitioning through the previous iteration's
    // join) and teleport join (base.id = c.dst, c already hash-partitioned
    // by the contribution aggregation) plan WITHOUT their own exchanges —
    // each iteration pays exactly ONE shuffle (the contribution sum).
    // N is pinned to the session's shuffle parallelism (scale-adaptive
    // conf, never a literal) so the checkpointed anchors and the
    // per-iteration aggregation exchanges stay co-partitioned.
    //
    // Values unchanged: repartition is semantically a no-op, and the
    // per-iteration snap9 already absorbs the contribution sum's
    // partitioning-dependent reorder (the documented cross-engine contract
    // — DuckDB sums in a different order than any Spark partitioning).
    import org.apache.spark.sql.{GraftSqlBridge => B}
    val nPart = nodes.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "200").toInt
    val ed = B.localCheckpointPartitioned(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
        .join(deg, Seq("src"))
        .repartition(nPart, col("src")))
    val ids = nodes.select(col(idCol).as("id"))
    val base = B.localCheckpointPartitioned(
      ids.crossJoin(broadcast(ids.agg(count(lit(1)).as("n"))))
        .repartition(nPart, col("id")))
    var pr = base
      .select(col("id"), snap9(lit(1.0) / col("n").cast("double")).as("r"))
    for (_ <- 1 to iters) {
      val c = ed.join(pr, ed("src") === pr("id"))
        .groupBy(col("dst")).agg(sum(col("r") / col("deg")).as("s"))
      pr = base
        .join(c, col("id") === col("dst"), "left")
        .select(col("id"),
          snap9(lit(teleport) / col("n").cast("double")
            + lit(damping) * coalesce(col("s"), lit(0.0))).as("r"))
    }
    pr.select(col("id"), col("r").as("pagerank"))
  }

  /** Undirected degree of every node touched by a pair list (each edge
    * given once, either endpoint order). Node-sized output — the shared
    * input to [[orientByDegree]] and the wedge count, so callers compute
    * it once.
    */
  def degreeOf(pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    // single-pass symmetrization (r17): union-of-two-projections executes
    // the pair relation once per branch when it isn't materialized (column
    // pruning de-canonicalizes the copies); one explode emits the same
    // endpoint multiset from one execution
    pairs.select(explode(array(col(aCol), col(bCol))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("d"))

  /** Degree-ordered acyclic orientation of an undirected pair list — the
    * node-iterator preparation that makes triangle counting SKEW-PROOF
    * (Schank & Wagner 2005; the "curse of the last reducer" fix of
    * Suri & Vassilvitskii, WWW 2011): each edge points from its smaller
    * (degree, id) endpoint to the larger, so a high-degree hub never
    * appears as a join SOURCE. Under a raw id orientation a low-id hub of
    * degree D sources all D edges and the `e2.src = e1.dst` self-join key
    * concentrates O(D²) wedge candidates in one task — the template-star
    * shape (one boilerplate page, 10⁵ near-copies) that melts a reducer at
    * 100×. Under degree order every spoke (degree 1) points AT the hub and
    * the hub sources only toward even-higher-degree nodes, of which a star
    * has none — max out-degree is bounded by √(2·|E|) for ANY graph, the
    * published guarantee. (deg, id) is a total order, hence acyclic, so
    * each triangle keeps exactly ONE orientation and counts are invariant
    * vs the id orientation — ComponentsSpec pins the equality on a
    * star+triangles fixture. `degrees` is [[degreeOf]]'s output, passed in
    * so the caller's wedge count shares the aggregation.
    */
  def orientByDegree(pairs: DataFrame, aCol: String, bCol: String,
      degrees: DataFrame): DataFrame = {
    val e = pairs.select(col(aCol).as("a"), col(bCol).as("b"))
    val withDeg = e
      .join(degrees.select(col("id").as("a"), col("d").as("da")), Seq("a"))
      .join(degrees.select(col("id").as("b"), col("d").as("db")), Seq("b"))
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("src"),
      when(aFirst, col("b")).otherwise(col("a")).as("dst"))
  }

  /** Triangle count over an undirected pair list via the degree-ordered
    * node-iterator join: orient with [[orientByDegree]], then close wedges
    * `(x,y),(y,z)` with the third edge `(x,z)` — each triangle matched
    * exactly once because the orientation is an acyclic total order. The
    * oriented edge list is localCheckpointed once (three join legs — the
    * q_pagerank lifecycle discipline); every shuffle is edge-relation-
    * sized. Returns one row `(n_triangles)`.
    */
  def countTriangles(pairs: DataFrame, aCol: String, bCol: String,
      degrees: DataFrame): DataFrame = {
    val o = orientByDegree(pairs, aCol, bCol, degrees).localCheckpoint(false)
    o.select(col("src").as("x"), col("dst").as("y"))
      .join(o.select(col("src").as("y"), col("dst").as("z")), Seq("y"))
      .join(o.select(col("src").as("x"), col("dst").as("z")), Seq("x", "z"))
      .agg(count(lit(1)).as("n_triangles"))
  }
}
