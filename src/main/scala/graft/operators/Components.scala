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
  * Algorithm: min-label propagation (the dataframe form of GraphX's
  * connectedComponents). Each iteration every node adopts the smallest
  * component id among itself and its neighbors:
  *
  *   labels(n) <- min(labels(n), min over edges (n,m) of labels(m))
  *
  * One shuffle join + one hash agg per iteration; converges in
  * O(component diameter) iterations, and near-dup clusters are shallow (a
  * hub-and-spoke dup cluster has diameter 2), so the loop exits after 3–4
  * rounds long before `maxIter`. Convergence is detected with sum(labels) —
  * labels only ever DECREASE, so an unchanged (monotone, exact integer) sum
  * means a fixpoint, without joining consecutive iterations against each
  * other.
  *
  * Scale notes: the driver loop is pure orchestration (one scalar action per
  * iteration — no row data on the driver). Each iteration's labels are
  * `localCheckpoint`ed: this truncates the growing lineage (an O(iters)-deep
  * plan would otherwise re-execute EVERY prior join each action) at the cost
  * of materializing |V| rows per round — the same trade GraphX makes. Skewed
  * hub nodes (one doc duplicated millions of times) cost one hot reduce key
  * per iteration; min() is a cheap partial agg, so map-side combine flattens
  * the skew before the shuffle.
  */
object Components {

  /** @param nodes  node universe; isolated nodes become their own component
    * @param idCol  node id column in `nodes` (castable to long)
    * @param edges  undirected edge list (each pair listed once, either order)
    * @param srcCol edge endpoint column in `edges`
    * @param dstCol other endpoint column in `edges`
    * @return (`<idCol>`, component) — component = min node id reachable
    */
  def connectedComponents(nodes: DataFrame, idCol: String,
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 20): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("a"),
        col(dstCol).cast("long").as("b"))
    // both directions once, so each iteration is a single join
    val und = e.union(e.select(col("b").as("a"), col("a").as("b")))
      .persist()

    // sum over ZERO rows is NULL, not 0 — read defensively so an empty node
    // set converges immediately instead of NPE-ing on getLong
    def labelSum(df: DataFrame): Long = {
      val r = df.agg(sum("comp")).head()
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }
    // release round i−1's localCheckpoint blocks once round i is
    // materialized: without this every iteration's |V| label snapshot stays
    // in block-manager storage until GC. Only safe AFTER the next round's
    // checkpoint has fully materialized (a localCheckpoint'd RDD cannot
    // recompute lost blocks) — the labelSum action below guarantees that.
    def releaseCheckpoint(df: DataFrame): Unit =
      df.queryExecution.analyzed.collect {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }.foreach(_.unpersist(blocking = false))

    var labels = nodes.select(col(idCol).cast("long").as("n")).distinct()
      .withColumn("comp", col("n"))
      .localCheckpoint(false)
    var prevSum = labelSum(labels)
    var iter = 0
    var converged = false

    while (iter < maxIter && !converged) {
      val nbrMin = und.join(labels, und("a") === labels("n"))
        .groupBy(und("b").as("n2"))
        .agg(min("comp").as("nbr_comp"))
      // lazy checkpoint: the convergence action below is what materializes
      // it — one job per round, not a checkpoint job + a sum job
      val next = labels.join(nbrMin, labels("n") === nbrMin("n2"), "left")
        .select(col("n"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp"))).as("comp"))
        .localCheckpoint(false)
      val s = labelSum(next)
      releaseCheckpoint(labels)
      converged = s == prevSum
      prevSum = s
      labels = next
      iter += 1
    }
    und.unpersist()
    labels.select(col("n").as(idCol), col("comp").as("component"))
  }
}
