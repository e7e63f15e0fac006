package graft.operators

import graft.etl.Maintenance
import graft.functions.VectorNative.{cosine, dot}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate-nearest-neighbor index over an
  * `array<float>` embedding column — the coarse-quantizer scale path the
  * brute-force scan ([[Similarity.bruteForceTopK]]) and sign-LSH
  * ([[Similarity.lshTopK]]) variants bracket:
  *
  *   - '''train''': Lloyd's k-means over the corpus, expressed entirely as
  *     DataFrame aggregations (one shuffle per iteration); only the k×dims
  *     centroid matrix ever reaches the driver.
  *   - '''assign''': each vector's nearest centroid, computed inside
  *     whole-stage codegen via the native dot expression — a map-only op.
  *   - '''probe''': rank only the `nProbe` clusters nearest the query.
  *
  * At 100 TB the assigned corpus is written `partitionBy("cluster")`, so a
  * probe is a partition-pruned scan of nProbe/k of the data; nothing here
  * ever materializes the corpus on the driver or compares all pairs.
  */
object Ivf {

  /** A trained coarse quantizer: row i is the centroid of cluster i. */
  final case class Model(centroids: Array[Array[Float]]) {
    def k: Int = centroids.length

    /** Cluster ids of the `nProbe` centroids nearest `query` (exact L2,
      * computed on the driver — the centroid table is tiny by construction).
      */
    def nearestClusters(query: Seq[Float], nProbe: Int): Seq[Int] = {
      require(centroids.isEmpty || query.length == centroids.head.length,
        s"query has ${query.length} dims, centroids have ${centroids.head.length}")
      val q = query.toArray
      centroids.zipWithIndex.map { case (c, i) => (l2sq(c, q), i) }
        .sortBy(identity).take(nProbe).map(_._2).toSeq
    }
  }

  private def vecLit(v: Seq[Float]): Column = array(v.map(x => lit(x)): _*)

  /** argmin over centroids of ‖v−c‖², computed as argmax of (v·c − ‖c‖²/2)
    * (the ‖v‖² term is constant per row). One native-dot per centroid, all
    * inside codegen; ties break to the smallest cluster id via the struct
    * ordering trick (array_max compares fields left-to-right). A malformed
    * vector (wrong dims / NULL element) gets a NULL cluster — same
    * convention as [[graft.functions.expr.GraftLshBucket]] — instead of
    * silently landing in cluster 0 through the all-NULL-score tie-break.
    */
  private def assignExpr(vec: Column, centroids: Array[Array[Float]]): Column = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      val halfNormSq = c.map(x => x.toDouble * x.toDouble).sum / 2.0
      struct((dot(vec, vecLit(c.toSeq)) - lit(halfNormSq)).as("score"),
        lit(-i).as("neg_id"))
    }
    val arg = (-array_max(array(scored: _*)).getField("neg_id")).cast("int")
    // dot is NULL exactly when the vector is malformed (for every centroid
    // alike, so checking the first suffices)
    when(dot(vec, vecLit(centroids.head.toSeq)).isNotNull, arg)
  }

  /** Public face of [[assignExpr]] for non-IVF nearest-centroid consumers
    * (nearest-centroid classification, drift assignment): the same
    * map-only, fully-codegen'd argmin — returns the INDEX into `centroids`
    * (NULL for malformed vectors), so callers keep their own index→label
    * mapping.
    */
  def nearestCentroidExpr(vec: Column, centroids: Array[Array[Float]]): Column =
    assignExpr(vec, centroids)

  private[operators] def l2sq(a: Array[Float], b: Array[Float]): Double = {
    // min length: distance to a malformed short vector is undefined anyway —
    // never index past either array (a short seed must not crash maxmin init)
    val n = math.min(a.length, b.length)
    var d = 0.0; var j = 0
    while (j < n) { val t = a(j).toDouble - b(j).toDouble; d += t * t; j += 1 }
    d
  }

  /** Lloyd's k-means with kmeans‖-style deterministic init: ONE distributed
    * pass draws a hash-ordered uniform sample of `initOversample × k`
    * candidates, then farthest-point (maxmin) refinement runs on the driver
    * over that small set — on well-separated data maxmin provably lands one
    * seed per cluster, where plain uniform sampling can collapse two seeds
    * into one. Each Lloyd iteration is one distributed pass (codegen'd
    * assignment → per-(cluster, dim) mean with map-side partial agg); only
    * O(k×dims) floats ever reach the driver. Clusters that lose all members
    * keep their previous centroid.
    */
  /** Index-sizing rule (r14, VERDICT r13 #5): `k = max(k0,
    * ceil(sqrt(n / targetCell)))` — the √n growth the sf1 recall note
    * prescribes, made executable instead of prose. The constant is
    * calibrated so the pinned sf1 operating point reproduces itself:
    * `targetCell = 2500` is the per-cell population of the r13-measured
    * config (20k vectors / k=8, nProbe=4 mean recall 0.93), so
    * derivedK(20000) = 8 ≡ the measured build, and k grows ∝ √n beyond it
    * (200k → 9, 2M → 29, 100 TB-order corpora → thousands of cells, each
    * a bounded partition-pruned scan unit). k0 floors tiny corpora at the
    * fixture-tested shape. RecallSpec pins the formula's fixed points;
    * SCALE.md records measured recall under derived k at sf1 and sf10.
    */
  def derivedK(n: Long, k0: Int = 8, targetCell: Long = 2500): Int = {
    require(n >= 0 && k0 >= 1 && targetCell >= 1)
    math.max(k0, math.ceil(math.sqrt(n.toDouble / targetCell)).toInt)
  }

  /** [[train]] with [[derivedK]] sizing: one footer-metadata count picks k,
    * so callers at unknown scale never ship the fixture constant to a
    * 100×-bigger corpus.
    */
  def trainSized(corpus: DataFrame, idCol: String, vecCol: String,
      iters: Int, k0: Int = 8, targetCell: Long = 2500,
      initOversample: Int = 32): Model =
    train(corpus, idCol, vecCol,
      derivedK(corpus.count(), k0, targetCell), iters, initOversample)

  def train(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, initOversample: Int = 32): Model = {
    // dims fixed by the FIRST well-formed vector: wrong-length rows must not
    // enter the sample — a short vector becoming a centroid silently trains
    // garbage AND breaks assignExpr's malformed-row detection (which relies
    // on dot being NULL against EVERY centroid alike)
    val dims0 = corpus
      .where(col(vecCol).isNotNull && !exists(col(vecCol), _.isNull))
      .select(size(col(vecCol))).head().getInt(0)
    val cand: Array[Array[Float]] = corpus
      // NULL vectors would NPE the collect; NULL elements would NPE the
      // unboxing; wrong-dims rows poison centroids — all malformed,
      // excluded from training
      .where(col(vecCol).isNotNull && !exists(col(vecCol), _.isNull) &&
        size(col(vecCol)) === dims0)
      .select(col(vecCol))
      .orderBy(xxhash64(col(idCol)), col(idCol))
      .limit(math.max(k, initOversample * k))
      .collect().map(_.getSeq[Float](0).toArray)
    require(cand.nonEmpty, "cannot train IVF on an empty corpus")
    var cents: Array[Array[Float]] = Array(cand.head)
    while (cents.length < k) {
      // strict > keeps the pick deterministic (first-seen wins on ties,
      // including the all-chosen case where every distance is 0)
      var best = cand.head; var bestD = -1.0
      for (v <- cand) {
        val d = cents.map(c => l2sq(v, c)).min
        if (d > bestD) { bestD = d; best = v }
      }
      cents = cents :+ best
    }

    val dims = cents.head.length
    for (_ <- 0 until iters) {
      val next = cents.map(_.clone())
      // per-dimension means as dims parallel avg aggregates: partial (map-side)
      // aggregation shrinks the shuffle to k rows × dims columns — no
      // posexplode blow-up of the corpus to rows × dims rows.
      // try_element_at: under ANSI mode (Spark 4 default) element_at would
      // THROW on a malformed short vector; try_ yields NULL, avg skips it,
      // and the null-dim guard below keeps the old centroid coordinate.
      val avgs = (0 until dims).map(j => avg(try_element_at(col(vecCol), lit(j + 1))))
      corpus
        .select(assignExpr(col(vecCol), cents).as("cluster"), col(vecCol))
        .where(col("cluster").isNotNull) // malformed vectors don't vote
        .groupBy(col("cluster")).agg(avgs.head, avgs.tail: _*)
        .collect()
        .foreach { r =>
          // a dim can be null only if every member vector was shorter than
          // `dims` (malformed input); keep the old centroid coordinate there
          val old = next(r.getInt(0))
          next(r.getInt(0)) = Array.tabulate(dims)(j =>
            if (r.isNullAt(j + 1)) old(j) else r.getDouble(j + 1).toFloat)
        }
      cents = next
    }
    Model(cents)
  }

  /** Adds the nearest-centroid `cluster` column — the index build. At scale,
    * persist this `partitionBy("cluster")` and probes become partition-pruned.
    */
  def assign(corpus: DataFrame, vecCol: String, model: Model): DataFrame =
    corpus.withColumn("cluster", assignExpr(col(vecCol), model.centroids))

  /** Materialize the IVF index at rest — the train-once/probe-many split a
    * serving path needs (mirrors [[Similarity.writeIndex]] for LSH):
    * `path`/data holds the corpus `partitionBy("cluster")` so a probe is a
    * partition-pruned scan of ~nProbe/k of the data, and `path`/centroids
    * holds the k×dims centroid matrix so probing never re-trains.
    * Malformed vectors (NULL cluster) are excluded — they can never be
    * probed (nearestClusters returns real ids) and a `cluster=__HIVE_DEFAULT
    * partition would poison partition pruning.
    */
  def writeClustered(corpus: DataFrame, idCol: String, vecCol: String,
      model: Model, path: String): Unit = {
    assign(corpus, vecCol, model)
      .where(col("cluster").isNotNull)
      .write.mode("overwrite").partitionBy("cluster").parquet(s"$path/data")
    val spark = corpus.sparkSession
    // member counts for the sidecar ([[refresh]]'s incremental-mean weights):
    // read back ONLY the partition column — a footer-metadata count, zero
    // data columns scanned
    val counts = new Array[Long](model.k)
    spark.read.parquet(s"$path/data")
      .groupBy(col("cluster")).count().collect()
      .foreach(r => counts(r.getInt(0)) = r.getLong(1))
    writeCentroids(spark, model.centroids, counts, path)
    // A full rebuild RESETS any retraction fence ([[removeKeyed]]) — the
    // data overwrite above already deleted the fenced files, so a stale
    // manifest would point at nothing; drop it and the versioned sidecars
    // LAST so a crash mid-rebuild fails loudly (fenced readers see missing
    // files) instead of silently serving half a corpus. A full rebuild is
    // not crash-atomic — rerunning writeClustered is its recovery, as with
    // any mode("overwrite") write.
    val (fs, _) = Maintenance.fsFor(spark, path)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/_manifest"), true)
    val root = new org.apache.hadoop.fs.Path(path)
    if (fs.exists(root)) fs.listStatus(root).foreach { st =>
      if (st.getPath.getName.startsWith("centroids_v"))
        fs.delete(st.getPath, true)
    }
  }

  // ---- retraction fence (r15, VERDICT r14 #1) --------------------------
  //
  // A plain [[writeClustered]] layout can only ever GROW (refresh appends);
  // retraction needs to REWRITE the touched cluster partitions, and a
  // rewrite on a bare directory has an unavoidable crash window (partition
  // deleted, replacement not yet visible). [[removeKeyed]] therefore
  // upgrades the store, on first retraction, to the same manifest fence
  // [[Maintenance]]'s stores use: `$path/_manifest/vNNNNNNNN.txt` lists the
  // live data files, readers resolve through it, and every mutation commits
  // with ONE atomic manifest rename. The centroid sidecar is VERSION-PAIRED
  // (`centroids_vNNNNNNNN`, written BEFORE the manifest rename), so data
  // view and sidecar always advance together: a kill anywhere inside a
  // mutation leaves the previous version fully consistent — both halves —
  // and a replay-from-the-top recomputes identical content with no heal
  // logic. A store that never retracts keeps the plain layout unchanged.

  /** Latest fence version of an index store; 0 = plain (unfenced) layout. */
  private def fenceVersion(spark: SparkSession, path: String): Long =
    Maintenance.manifestVersion(spark, path)

  private def sidecarPath(path: String, version: Long): String =
    if (version == 0L) s"$path/centroids"
    else f"$path/centroids_v$version%08d"

  /** Read the index corpus — manifest-fenced when the store has been
    * through a retraction, plain directory listing otherwise. Every probe
    * and maintenance read resolves through this, so staged-but-uncommitted
    * files (a crashed mutation's orphans) are invisible by construction.
    */
  def readData(spark: SparkSession, path: String): DataFrame = {
    val v = fenceVersion(spark, path)
    if (v == 0L) spark.read.parquet(s"$path/data")
    else {
      val files = Maintenance.liveFiles(spark, path)
      require(files.nonEmpty,
        s"IVF index at $path is fenced (v$v) but lists no live files — " +
          "every vector was retracted; rebuild with writeClustered")
      spark.read.option("basePath", s"$path/data").parquet(files: _*)
    }
  }

  /** Current sidecar as (centroids, member counts), version-resolved. */
  private def readSidecar(spark: SparkSession,
      path: String): (Array[Array[Float]], Array[Long]) = {
    val sp = sidecarPath(path, fenceVersion(spark, path))
    val side = spark.read.parquet(sp)
      .select(col("cluster"), col("centroid"), col("n_members")).collect()
    require(side.nonEmpty, s"no centroids at $sp")
    val k = side.map(_.getInt(0)).max + 1
    val cents = new Array[Array[Float]](k)
    val counts = new Array[Long](k)
    side.foreach { r =>
      cents(r.getInt(0)) = r.getSeq[Float](1).toArray
      counts(r.getInt(0)) = r.getLong(2)
    }
    (cents, counts)
  }

  /** Commit a mutation against a FENCED store as the next version: write
    * the version-paired sidecar first, then publish the manifest whose
    * rename makes sidecar + data view visible atomically together. `staged`
    * are newly-written data files (relative paths) to add; partitions named
    * in `dropDirs` drop their previous files (their replacement content, if
    * any, is in `staged`).
    *
    * The sidecar lands via write-to-unique-temp + one rename into the
    * versioned slot (r16, ADVICE r15): a racing writer that finds the slot
    * occupied checks the manifest — if v+1 is already published it fails
    * LOUDLY without touching the winner's referenced sidecar (the direct
    * overwrite this replaced could clobber it before losing the manifest
    * claim). An occupied slot with the manifest still at v is a crashed
    * attempt's orphan (single-maintainer contract: no live racer during a
    * replay), deleted and replaced — which keeps crash-replay idempotent.
    * Residual window, documented not closed: two writers racing INSIDE the
    * orphan-check-to-rename instant can still interleave; the
    * single-maintainer contract is what actually excludes that.
    */
  private def commitFenced(spark: SparkSession, path: String,
      cents: Array[Array[Float]], counts: Array[Long],
      staged: Seq[String], dropDirs: Set[String]): Unit = {
    val (fs, _) = Maintenance.fsFor(spark, path)
    val mdir = new org.apache.hadoop.fs.Path(s"$path/_manifest")
    val v = Maintenance.latestManifestVersion(fs, mdir)
    val dataBase = s"$path/data/"
    val kept = Maintenance.liveFiles(spark, path).map(_.stripPrefix(dataBase))
      .filterNot(f => dropDirs.contains(f.takeWhile(_ != '/')))
    val tmpSide = s"$path/centroids_.tmp-${java.util.UUID.randomUUID()}"
    writeCentroidsTo(spark, cents, counts, tmpSide)
    val tmpP = new org.apache.hadoop.fs.Path(tmpSide)
    val target = new org.apache.hadoop.fs.Path(sidecarPath(path, v + 1))
    if (fs.exists(target)) {
      if (Maintenance.latestManifestVersion(fs, mdir) > v) {
        fs.delete(tmpP, true)
        throw new IllegalStateException(
          s"sidecar commit v${v + 1} lost a race — concurrent writer on $path")
      }
      fs.delete(target, true) // crashed-attempt orphan; replay rewrites it
    }
    require(fs.rename(tmpP, target), s"sidecar rename failed: $tmpSide -> $target")
    Maintenance.publishManifest(fs, mdir, v, (kept ++ staged).sorted, path)
  }

  /** Centroid sidecar: one tiny file of (cluster, centroid, n_members) —
    * n_members carries the weights [[refresh]] needs to fold new vectors
    * into a centroid as an exact incremental mean. `version` > 0 writes the
    * fence-paired sidecar ([[removeKeyed]] stores); 0 the plain one.
    */
  private def writeCentroids(spark: SparkSession, cents: Array[Array[Float]],
      counts: Array[Long], path: String, version: Long = 0L): Unit =
    writeCentroidsTo(spark, cents, counts, sidecarPath(path, version))

  private def writeCentroidsTo(spark: SparkSession, cents: Array[Array[Float]],
      counts: Array[Long], dir: String): Unit = {
    import spark.implicits._
    cents.zipWithIndex
      .map { case (c, i) => (i, c.toSeq, counts(i)) }.toSeq
      .toDF("cluster", "centroid", "n_members")
      // coalesce(1) is safe here ONLY because the sidecar is k rows of
      // dims floats (KBs); if k ever grows to where a one-task write
      // matters, switch to repartition(1) so upstream parallelism is
      // preserved — do not let this pattern migrate to data-sized writes
      .coalesce(1)
      .write.mode("overwrite").parquet(dir)
  }

  /** Incremental index maintenance — fold `newDocs` into a [[writeClustered]]
    * layout WITHOUT retraining or rewriting the existing corpus:
    *
    *   1. assign each new vector to its nearest existing centroid (map-only,
    *      codegen'd) and APPEND it into the partition-pruned data layout —
    *      dynamic partition append touches only the clusters that actually
    *      received vectors; every pre-existing file stays byte-identical;
    *   2. recompute ONLY the touched centroids as the exact incremental mean
    *      `(n_old·c + Σ new members) / (n_old + n_new)` from one aggregation
    *      over the new rows (per-cluster count + per-dim sums — O(k×dims)
    *      to the driver, like train), and rewrite the tiny sidecar.
    *
    * Probes immediately see the appended vectors. Centroid drift is bounded
    * by construction (each refresh moves a centroid toward the true mean of
    * its members), but old rows keep their original partition assignment —
    * after MANY refreshes on a drifting corpus the assignment/centroid gap
    * grows and recall decays toward the rebuild threshold; RecallSpec gates
    * recall@20 after a 20% append, and a full [[train]]+[[writeClustered]]
    * remains the reset. Crash between the append and the sidecar write
    * leaves a probeable index (new rows visible, centroids one step stale) —
    * re-running the refresh with the same docs would double-append, so
    * callers retry at the pipeline level with a fresh copy of the failed
    * batch, as with any at-least-once parquet append.
    *
    * Returns the updated model.
    */
  def refresh(spark: SparkSession, path: String, vecCol: String,
      newDocs: DataFrame): Model = {
    val fenceV = fenceVersion(spark, path)
    val (cents, counts) = readSidecar(spark, path)
    val model = Model(cents)
    val dims = cents.head.length

    // the new slice is small relative to the index — cache it so the append
    // and the stats aggregation don't each re-read/re-assign the source
    val assigned = assign(newDocs, vecCol, model)
      .where(col("cluster").isNotNull)
      .select(newDocs.columns.map(col) :+ col("cluster"): _*)
      .persist()
    try {
      // on a FENCED store the appended files stay invisible until the
      // commitFenced publish below — which upgrades refresh's documented
      // at-least-once append to an atomic commit (a crash before the
      // publish leaves the previous version intact and replayable)
      val before =
        if (fenceV > 0) Maintenance.dataFilesOnDisk(spark, path) else Set.empty[String]
      assigned.write.mode("append").partitionBy("cluster").parquet(s"$path/data")
      val aggs = count(lit(1)).as("n_new") +:
        (0 until dims).map(j =>
          sum(try_element_at(col(vecCol), lit(j + 1))).as(s"s$j"))
      val stats = assigned.groupBy(col("cluster")).agg(aggs.head, aggs.tail: _*)
        .collect()
      stats.foreach { r =>
        val c = r.getInt(0)
        val nNew = r.getLong(1)
        val tot = counts(c) + nNew
        cents(c) = Array.tabulate(dims) { j =>
          val s = if (r.isNullAt(j + 2)) 0.0 else r.getDouble(j + 2)
          ((cents(c)(j).toDouble * counts(c) + s) / tot).toFloat
        }
        counts(c) = tot
      }
      if (fenceV > 0) {
        val staged = (Maintenance.dataFilesOnDisk(spark, path) -- before)
          .toSeq.sorted
        commitFenced(spark, path, cents, counts, staged, Set.empty)
      } else writeCentroids(spark, cents, counts, path)
      Model(cents)
    } finally assigned.unpersist()
  }

  /** Replay-safe [[refresh]] (r11, the OPERATIONS.md step-6 idempotency
    * gap): plain `refresh` is an at-least-once parquet append — re-running
    * a crashed day's batch double-appends every vector. This variant keys
    * the batch on `idCol`:
    *
    *   1. anti-join the batch against the ids ALREADY IN the index (an
    *      id-column-only scan — column pruning keeps vectors out of it);
    *      surviving rows take the normal append + incremental-mean path;
    *   2. if any batch rows were dropped as already-present, the previous
    *      run may have died INSIDE the crash window (rows appended, sidecar
    *      not yet updated) — so the sidecar entries for the dropped rows'
    *      clusters are RECOMPUTED exactly from the at-rest data
    *      (partition-pruned to those clusters), healing a stale sidecar
    *      instead of silently carrying it.
    *
    * Rerunning the same batch any number of times converges to exactly one
    * copy of each vector and exact per-cluster counts/means for every
    * touched cluster — the AT-REST fixed point. Note the heal recompute is
    * the exact member mean, which can differ (bounded, one-time) from the
    * single-successful-run sidecar value: plain refresh's incremental mean
    * is anchored on the TRAINED centroid, which is generally not the member
    * mean, so a replay that fires the heal branch moves the sidecar from
    * the incremental estimate to the exact one and stays there (idempotent
    * from the second run). Cost over plain refresh: one id-only index scan
    * per refresh, plus a per-touched-cluster mean recompute ONLY on a
    * replay that actually healed something.
    */
  def refreshKeyed(spark: SparkSession, path: String, idCol: String,
      vecCol: String, newDocs: DataFrame): Model = {
    val existingIds = readData(spark, path).select(col(idCol))
    // eager localCheckpoint, not persist: the anti-join READS the very
    // layout the refresh is about to APPEND to — any lazy recomputation
    // after the append would see its own output and dedup everything
    // (the Maintenance.upsert merge-hazard rule); checkpoint-not-cache so
    // memory pressure fails loudly instead of silently recomputing
    val fresh = newDocs.join(existingIds, Seq(idCol), "left_anti")
      .localCheckpoint(true)
    locally {
      val nFresh = fresh.count()
      val nBatch = newDocs.count()
      val model =
        if (nFresh > 0) refresh(spark, path, vecCol, fresh)
        else loadModel(spark, path)
      if (nFresh == nBatch) model
      else {
        // some batch rows were already present: heal the sidecar for their
        // clusters from the at-rest data (exact per-cluster count + mean).
        // The touched clusters come from the DATA's own partition column —
        // re-assigning against current centroids could disagree with the
        // assignment the crashed run actually wrote (centroids have moved)
        val replayedIds = newDocs.select(col(idCol))
          .join(fresh.select(col(idCol)), Seq(idCol), "left_anti")
        val touched = readData(spark, path)
          .join(replayedIds, Seq(idCol))
          .select(col("cluster")).distinct().collect().map(_.getInt(0))
        if (touched.isEmpty) model
        else {
          val dims = model.centroids.head.length
          val aggs = count(lit(1)).as("n") +:
            (0 until dims).map(j =>
              avg(try_element_at(col(vecCol), lit(j + 1))).as(s"m$j"))
          val stats = readData(spark, path)
            .where(col("cluster").isin(touched.map(Integer.valueOf): _*))
            .groupBy(col("cluster")).agg(aggs.head, aggs.tail: _*)
            .collect()
          val (cents, counts) = readSidecar(spark, path)
          stats.foreach { r =>
            val c = r.getInt(0)
            counts(c) = r.getLong(1)
            cents(c) = Array.tabulate(dims)(j =>
              if (r.isNullAt(j + 2)) 0.0f else r.getDouble(j + 2).toFloat)
          }
          // fenced store: the heal is a sidecar-only version bump (same
          // live file set); plain store: the in-place sidecar overwrite
          if (fenceVersion(spark, path) > 0)
            commitFenced(spark, path, cents, counts, Nil, Set.empty)
          else writeCentroids(spark, cents, counts, path)
          Model(cents)
        }
      }
    }
  }

  /** RETRACT vectors from a written index by id (r15, VERDICT r14 #1 — the
    * takedown/GDPR leg [[graft.etl.Maintenance.snapshotDiff]] removals
    * need: docs left the doc store and the near-dup band index, but the
    * ANN index kept serving their vectors forever). Appends can share a
    * directory; retraction cannot — it must REWRITE the touched cluster
    * partitions — so the first removal upgrades the store to the manifest
    * fence (see the fence section above) and every subsequent mutation
    * commits atomically:
    *
    *   1. the touched clusters come from an (id, cluster)-only scan of the
    *      LIVE view joined to the removal ids — column-pruned, the vectors
    *      never move;
    *   2. each touched cluster's SURVIVING rows are staged as new files
    *      (append-only — the live files are never modified), and their
    *      exact member count + mean are recomputed from that same staged
    *      relation (one aggregation, O(k×dims) to the driver) — the same
    *      at-rest fixed point [[refreshKeyed]]'s heal converges to. A
    *      cluster emptied by the removal keeps its old centroid at
    *      n_members = 0 (the [[train]] empty-cluster convention), so probe
    *      routing stays total;
    *   3. the version-paired sidecar is written, THEN one manifest rename
    *      publishes data view + sidecar together.
    *
    * Crash-replay idempotent with no journal and no heal: a kill anywhere
    * before the rename leaves the previous version fully consistent (the
    * removed ids still live, the staged orphans invisible), and a replay
    * from the top recomputes identical content; after the rename the ids
    * are gone, so a replay finds zero touched clusters and is a no-op.
    * Orphaned staged files from crashed attempts — data files AND
    * superseded/staged `centroids_v*` sidecars (r16) — are reclaimed by
    * [[graft.etl.Maintenance.vacuumManifested]] (same layout contract).
    * Ids in `removals` that are not in the index are ignored. Returns the
    * updated model.
    */
  def removeKeyed(spark: SparkSession, path: String, idCol: String,
      vecCol: String, removals: DataFrame): Model = {
    // the touched set comes from the CURRENT view (plain or fenced — both
    // resolve the same live files) BEFORE any layout mutation, so a batch
    // with zero matching ids is a pure no-op: it must not upgrade a plain
    // store to the fenced layout as a side effect (r16, ADVICE r15)
    val data = readData(spark, path)
    val ids = removals.select(col(idCol)).distinct()
    val touched = data.select(col(idCol), col("cluster"))
      .join(ids, Seq(idCol))
      .select(col("cluster")).distinct().collect().map(_.getInt(0)).sorted
    if (touched.isEmpty) loadModel(spark, path) // replay fixed point: no-op
    else {
      if (fenceVersion(spark, path) == 0L) {
        // ---- fence bootstrap (first EFFECTIVE retraction of a plain
        // store): v1 is the store exactly as it stands — current files,
        // current sidecar. The sidecar copy goes FIRST: a kill between the
        // two writes leaves a plain store (v1 unpublished) and the replay
        // overwrites the copy. `data` read above still resolves the same
        // files after the bootstrap — v1 lists exactly the plain listing.
        val files = Maintenance.dataFilesOnDisk(spark, path).toSeq.sorted
        require(files.nonEmpty, s"no IVF data at $path/data")
        val (cents, counts) = readSidecar(spark, path)
        writeCentroids(spark, cents, counts, path, 1L)
        val (fs, _) = Maintenance.fsFor(spark, path)
        Maintenance.publishManifest(fs,
          new org.apache.hadoop.fs.Path(s"$path/_manifest"), 0L, files, path)
      }
      val (cents, counts) = readSidecar(spark, path)
      val dims = cents.head.length
      // re-resolve through the fence: the surviving rows APPEND into the
      // same directory they scan, so the scan must carry the explicit
      // manifest file list (the plain `data` read above is only used for
      // the touched-set probe, which finishes before any write)
      val kept = readData(spark, path)
        .where(col("cluster").isin(touched.map(Integer.valueOf): _*))
        .join(ids, Seq(idCol), "left_anti")
        .persist()
      try {
        val before = Maintenance.dataFilesOnDisk(spark, path)
        kept.write.mode("append").partitionBy("cluster")
          .parquet(s"$path/data")
        val staged = (Maintenance.dataFilesOnDisk(spark, path) -- before)
          .toSeq.sorted
        val aggs = count(lit(1)).as("n") +:
          (0 until dims).map(j =>
            avg(try_element_at(col(vecCol), lit(j + 1))).as(s"m$j"))
        val stats = kept.groupBy(col("cluster")).agg(aggs.head, aggs.tail: _*)
          .collect()
        touched.foreach(c => counts(c) = 0L) // emptied unless stats say else
        stats.foreach { r =>
          val c = r.getInt(0)
          counts(c) = r.getLong(1)
          cents(c) = Array.tabulate(dims)(j =>
            if (r.isNullAt(j + 2)) cents(c)(j) else r.getDouble(j + 2).toFloat)
        }
        commitFenced(spark, path, cents, counts, staged,
          touched.map(c => Maintenance.partitionDirName("cluster", c)).toSet)
        Model(cents)
      } finally kept.unpersist()
    }
  }

  /** Load the trained coarse quantizer back from a [[writeClustered]] layout
    * (tiny driver-side read: k rows of dims floats).
    */
  def loadModel(spark: SparkSession, path: String): Model = {
    val sp = sidecarPath(path, fenceVersion(spark, path))
    val rows = spark.read.parquet(sp)
      .orderBy(col("cluster")).select(col("centroid")).collect()
    require(rows.nonEmpty, s"no centroids at $sp")
    Model(rows.map(_.getSeq[Float](0).toArray))
  }

  /** Probe a written index: partition-pruned scan of the `nProbe` clusters
    * nearest the query — train cost paid once at [[writeClustered]] time,
    * never per query (StorageLayoutSpec asserts the PartitionFilters reach
    * the scan).
    */
  def probeClustered(spark: SparkSession, path: String, idCol: String,
      vecCol: String, query: Seq[Float], nProbe: Int, k: Int): DataFrame = {
    val probes = loadModel(spark, path).nearestClusters(query, nProbe)
    readData(spark, path)
      .where(col("cluster").isin(probes: _*))
      .select(col(idCol), col("cluster"),
        cosine(col(vecCol), vecLit(query)).as("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col(idCol))
      .limit(k)
  }

  /** Two-phase QUANTIZED probe of a written index whose data partitions
    * carry an int8 column (`qCol`, built with
    * [[graft.functions.VectorFunctions.quantizeInt8]]) alongside the float
    * vectors — the standard serving layout at 100 TB:
    *
    *   - '''phase 1''' scans ONLY the `nProbe` pruned cluster partitions and
    *     scores the int8 vectors against the int8-quantized query
    *     (`cosineInt` — exact integer dot/norms, one double divide), keeping
    *     the top `rerank` candidates via TakeOrderedAndProject. Per-vector
    *     scales cancel in cosine, so int8 ranks track float ranks to ~0.4%
    *     relative error — and the scan reads 1/4 the vector bytes;
    *   - '''phase 2''' broadcasts the tiny candidate id list back into a
    *     second pruned scan, fetches ONLY those rows' float vectors, and
    *     exact-reranks to the final top `k`.
    *
    * `rerank ≥ 3k` makes a quantization-induced rank error at the k-boundary
    * need ~rerank−k near-ties to survive into the output; RecallSpec gates
    * the declared config against the unquantized probe and pins the
    * structural identity `rerank ≥ cluster content ⇒ ≡ probeClustered`.
    */
  def probeClusteredQuantized(spark: SparkSession, path: String, idCol: String,
      vecCol: String, qCol: String, query: Seq[Float], nProbe: Int, k: Int,
      rerank: Int): DataFrame = {
    require(rerank >= k, s"rerank ($rerank) must be >= k ($k)")
    val probes = loadModel(spark, path).nearestClusters(query, nProbe)
    // driver-side quantization of the probe, same scheme as quantizeInt8:
    // scale = max|x|/127, q = floor(x/scale + 0.5)
    val qscale =
      if (query.isEmpty) 0.0
      else query.map(x => math.abs(x.toDouble)).max / 127.0
    val pq = query.map(x =>
      if (qscale == 0.0) 0 else math.floor(x.toDouble / qscale + 0.5).toInt)
    val pqLit = array(pq.map(lit(_)): _*)
    val data = readData(spark, path)
      .where(col("cluster").isin(probes: _*))
    val cand = data
      .select(col(idCol),
        graft.functions.VectorFunctions.cosineInt(col(qCol), pqLit).as("qcos"))
      .orderBy(col("qcos").desc_nulls_last, col(idCol))
      .limit(rerank)
    data
      .join(broadcast(cand.select(col(idCol))), Seq(idCol), "left_semi")
      .select(col(idCol), col("cluster"),
        cosine(col(vecCol), vecLit(query)).as("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col(idCol))
      .limit(k)
  }

  /** Serving-knob sibling of [[derivedK]] (r15, VERDICT r14 #4): the
    * measured operating points were prose until now — this makes the
    * default serve path execute them. SCALE.md r14 (regenerated-corpus
    * numbers, `ProbeRecallDerived`): a ~10⁴-vector index needs nProbe=6
    * for ≥ 0.9 mean recall@20 (sf1/20k: 0.756 @ 4, 0.922 @ 6 — small
    * corpora REACH across cell boundaries for their top-k); from ~10⁵
    * vectors up, derived-√n-k at nProbe=4 clears 0.9 with growing margin
    * (sf10/200k: 0.987; sf30/600k: 1.000) while the probed fraction ≈ 4/k
    * keeps shrinking. Capped at k — probing more cells than exist is the
    * brute scan.
    */
  def derivedNProbe(n: Long, k: Int): Int = {
    require(n >= 0 && k >= 1)
    math.min(k, if (n < 100000L) 6 else 4)
  }

  /** [[probeClustered]] with nProbe DERIVED from the index's own sidecar
    * (n = Σ n_members, k = centroid count) — the self-describing serve
    * path: callers at unknown scale never ship a fixture knob to an index
    * three decades bigger. One extra tiny sidecar read per probe.
    */
  def probeClusteredSized(spark: SparkSession, path: String, idCol: String,
      vecCol: String, query: Seq[Float], k: Int): DataFrame = {
    val (cents, counts) = readSidecar(spark, path)
    probeClustered(spark, path, idCol, vecCol, query,
      derivedNProbe(counts.sum, cents.length), k)
  }

  /** [[probeClusteredQuantized]] with the sidecar-derived nProbe (and the
    * RecallSpec-gated rerank = 3k default).
    */
  def probeClusteredQuantizedSized(spark: SparkSession, path: String,
      idCol: String, vecCol: String, qCol: String, query: Seq[Float],
      k: Int): DataFrame = {
    val (cents, counts) = readSidecar(spark, path)
    probeClusteredQuantized(spark, path, idCol, vecCol, qCol, query,
      derivedNProbe(counts.sum, cents.length), k, rerank = 3 * k)
  }

  /** IVF top-k: cosine-rank only the `nProbe` clusters nearest the query.
    * Recall < 1 by construction (like every IVF); nProbe/k is the knob.
    * The final orderBy+limit plans as TakeOrderedAndProject (per-partition
    * heap + driver merge of k rows), not a global sort.
    */
  def topK(corpus: DataFrame, idCol: String, vecCol: String, model: Model,
      query: Seq[Float], nProbe: Int, k: Int): DataFrame = {
    val probes = model.nearestClusters(query, nProbe)
    assign(corpus, vecCol, model)
      .where(col("cluster").isin(probes: _*))
      .select(col(idCol), col("cluster"),
        cosine(col(vecCol), vecLit(query)).as("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col(idCol))
      .limit(k)
  }
}
