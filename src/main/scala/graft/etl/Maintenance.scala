package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, concat_ws, lag, lead, lit, md5, row_number, when}

/** Table-maintenance operations a long-lived 100 TB deployment needs around
  * the query engine itself: small-file compaction and schema-evolving reads.
  * (Cite: the reference rewrites its whole DuckDB file per run —
  * `run_pipeline.py` load stage — so it never faces these; a Spark
  * deployment accumulating parquet drops does.)
  */
object Maintenance {

  /** Read a parquet directory whose files were written under EVOLVING
    * schemas (columns added over time): `mergeSchema` unions the per-file
    * footers, and files missing a column yield NULL for it — the append-only
    * ingestion contract. Schema merging lists every footer (a driver-side
    * O(files) step), so keep it an explicit opt-in for evolved dirs, not a
    * default on every read.
    */
  def readEvolved(spark: SparkSession, dir: String): DataFrame =
    readEvolved(spark, Seq(dir))

  /** Multi-path form (r9): one merged frame across SEPARATE snapshot
    * directories (month partitions, versioned drops) — the same footer
    * union, so a corpus that grew a `lang` column in month 3 reads as one
    * table across all months without rewriting history; incompatible
    * evolutions (same column, different type) still fail loudly at read
    * time (StorageExtSpec pins NULL surfacing, common-column pushdown,
    * and the loud conflict).
    */
  def readEvolved(spark: SparkSession, paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "readEvolved needs at least one path")
    spark.read.option("mergeSchema", "true").parquet(paths: _*)
  }

  /** Compact a parquet directory's small files toward `targetBytes` output
    * files (in-place: rewrite then atomically swap is the production
    * pattern; here rewrite-to-target keeps the operation explicit).
    * Small-file proliferation is THE silent killer of scan parallelism
    * economics at scale: a 100 TB table in 10 MB files costs 10M task
    * launches per scan. Sizing = ceil(inputBytes / targetBytes), from the
    * files' actual on-disk size (not row counts — rows compress
    * unpredictably).
    */
  def compact(spark: SparkSession, dir: String, outDir: String,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    // size via the Hadoop FS abstraction, recursively: java.io.File NPEs on
    // non-local URIs (s3a://…) and a flat listing misses files nested under
    // partition dirs — either would silently size the rewrite at 0 bytes
    // and collapse a large table to repartition(1)
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    var inputBytes = 0L
    val it = fs.listFiles(path, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet"))
        inputBytes += f.getLen
    }
    val nFiles = math.max(1, math.ceil(inputBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(dir)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(outDir)
    nFiles
  }

  /** Compute catalog statistics so the cost-based optimizer can size joins
    * from measured bytes/rows instead of defaults — the difference between
    * CBO choosing a broadcast and shuffling a dimension at scale.
    */
  def analyzeTable(spark: SparkSession, table: String,
      columns: Seq[String] = Nil): Unit = {
    spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS")
    if (columns.nonEmpty)
      spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS FOR COLUMNS ${columns.mkString(", ")}")
  }

  /** The monthly rollup in its at-rest maintained form: one row per
    * (month, event_type), partitioned on disk by `month`.
    */
  def monthlyRollup(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    events.groupBy(date_format(col("ts"), "yyyy-MM").as("month"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        // 1e-12-quantized picounit sum (Exact.pico12 rationale): the
        // incremental-refresh ≡ full-rebuild gate compares these totals
        // exactly, and only an order-free sum makes that equality hold by
        // construction rather than by accumulation-order luck
        graft.functions.Exact.sum12(col("value")).as("sum_value"))
  }

  /** Full (re)build of the at-rest monthly rollup. */
  def writeMonthlyRollup(events: DataFrame, outDir: String): Unit =
    monthlyRollup(events).write.mode("overwrite").partitionBy("month").parquet(outDir)

  /** Incremental rollup refresh — the daily-maintenance pattern a 100 TB
    * warehouse actually runs: late/new facts touch a handful of months, so
    * recompute ONLY those partitions and swap them in with DYNAMIC partition
    * overwrite (static overwrite mode would delete every untouched month on
    * the way in; full rebuild would re-aggregate the whole history for a
    * day's delta).
    *
    * Caller contract: `monthsSlice` is the COMPLETE current fact data for
    * every month it contains (partition replacement is all-or-nothing per
    * month — a delta-only slice would shrink those months to just the new
    * rows). With month partitioning on the fact table that slice is itself
    * a partition-pruned scan, never a full pass.
    *
    * @return the month partition values that were rewritten
    */
  def refreshMonthlyRollup(monthsSlice: DataFrame, outDir: String): Seq[String] = {
    // the rollup is one row per (month, event_type) — tiny — but its INPUT
    // is the delta scan+shuffle; persist so the touched-months collect and
    // the write share one aggregation instead of re-running it
    val rollup = monthlyRollup(monthsSlice).persist()
    try {
      val touched = rollup.select("month").distinct()
        .collect().map(_.getString(0)).toSeq.sorted
      writeDynamic(rollup, "month", outDir)
      touched
    } finally rollup.unpersist(blocking = false)
  }

  /** General MERGE-shaped keyed upsert into a partitioned parquet store:
    * rows whose `keyCols` appear in `updates` are replaced, other keys in
    * the same partitions are carried over, and partitions absent from
    * `updates` keep their exact files (dynamic partition overwrite). The
    * production maintenance pattern over any partition axis — month, date,
    * scenario — with the same caller contract everywhere: `updates` rows
    * are COMPLETE current values for their keys (not deltas), so
    * re-applying the same batch writes the same bytes and the upsert is
    * IDEMPOTENT for replays that arrive AFTER a successful commit — which
    * is what makes foreachBatch's at-least-once redelivery safe on a
    * plain-parquet store. The commit itself is NOT crash-atomic on plain
    * parquet: dynamic overwrite clears each touched partition before the
    * staged files move in, so a crash inside that window can lose carried
    * rows for keys absent from the replayed batch (the merge source dies
    * with the driver). Production durability around the commit window
    * needs an ACID table format or a write-to-temp-then-swap layout on
    * top; this operator's contract is clean-replay idempotence, not
    * mid-commit crash recovery.
    *
    * `partitionCol` must be one of `keyCols` (enforced) so a key's
    * replacement lands in the same partition it is carried from; a caller
    * whose partition axis is merely functionally determined by the key
    * (e.g. month derived from a date key) derives it into the key set
    * first.
    *
    * The merged slice is eagerly `localCheckpoint`ed BEFORE the dynamic
    * overwrite: the merge reads the very partitions the write replaces, so
    * a lazily-evaluated plan would scan files the overwrite just deleted
    * (checkpoint-not-cache: a cache under memory pressure would silently
    * recompute from the deleted files; a lost checkpoint fails loudly).
    *
    * @return the touched partition values (as strings), sorted
    */
  /** Partition-pruning predicate over the touched partition values. NOT a
    * bare `isin`: NULL partition values are legal (they land in
    * __HIVE_DEFAULT_PARTITION__) and `isin` never matches NULL — a bare
    * isin would skip carrying the null partition's other keys while the
    * write still replaces it, silently deleting them.
    */
  private def touchedFilter(partitionCol: String,
      touched: Seq[Any]): org.apache.spark.sql.Column = {
    val (nulls, vals) = touched.partition(_ == null)
    val base =
      if (vals.nonEmpty) col(partitionCol).isin(vals: _*) else lit(false)
    if (nulls.nonEmpty) base || col(partitionCol).isNull else base
  }

  /** Anti-join the carried slice against the update keys with NULL-SAFE
    * equality: partitionCol ∈ keyCols means a null partition value is also
    * a null key, and a plain equality anti-join would never match it — the
    * old row would be carried ALONGSIDE its replacement as a duplicate key.
    */
  private def antiJoinKeys(slice: DataFrame, up: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val upKeys = up.select(keyCols.map(c => col(c).as(s"__u_$c")): _*).distinct()
    val cond = keyCols.map(c => col(c) <=> col(s"__u_$c")).reduce(_ && _)
    slice.join(upKeys, cond, "left_anti")
  }

  def upsert(updates: DataFrame, keyCols: Seq[String], partitionCol: String,
      outDir: String): Seq[String] = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    // a partition axis outside the key silently duplicates moved keys: the
    // old row of a key whose partition value changed sits in a partition
    // that is neither read (isin on touched) nor overwritten (dynamic
    // mode), so it survives alongside the replacement. Direct membership is
    // the only contract this store can check cheaply — a caller with a
    // partition column merely FUNCTIONALLY determined by the key must
    // derive it into the key set instead.
    require(keyCols.contains(partitionCol),
      s"partitionCol '$partitionCol' must be one of keyCols " +
        s"${keyCols.mkString("[", ", ", "]")} — otherwise a key that moves " +
        "partitions leaves its old row behind as a silent duplicate")
    val spark = updates.sparkSession
    val up = updates.persist()
    try {
      // raw values for the pruning filter (isin on the column's real type);
      // strings only for the caller-facing report
      val touched = up.select(partitionCol).distinct()
        .collect().map(_.get(0)).toSeq
      if (touched.isEmpty) Nil
      else {
        // only a store with NO committed data (first write, or a crashed
        // first write that left just _temporary behind) may read as empty;
        // any other read failure must propagate — a swallowed transient
        // error here would rewrite the touched partitions with ONLY the
        // updated keys, silently deleting every carried row. fs.exists
        // alone is the wrong probe: a dir with zero committed footers
        // exists but throws UNABLE_TO_INFER_SCHEMA forever, a permanent
        // crash loop.
        val outPath = new org.apache.hadoop.fs.Path(outDir)
        val fs = outPath.getFileSystem(spark.sessionState.newHadoopConf())
        val existing =
          if (!fs.exists(outPath)) None
          else scala.util.Try(spark.read.parquet(outDir)) match {
            case scala.util.Success(df) =>
              Some(df.where(touchedFilter(partitionCol, touched)))
            case scala.util.Failure(e: org.apache.spark.sql.AnalysisException)
                if e.getMessage.contains("UNABLE_TO_INFER_SCHEMA") => None
            case scala.util.Failure(e) => throw e
          }
        val carried = existing.fold(up.limit(0))(antiJoinKeys(_, up, keyCols))
        val merged = carried.unionByName(up).localCheckpoint(true)
        writeDynamic(merged, partitionCol, outDir)
        // report in the axis' NATURAL order, not lexicographic on the
        // stringified form (which would order numeric partitions 10 < 2);
        // nulls — the __HIVE_DEFAULT_PARTITION__ rows — sort first
        val (nulls, vals) = touched.partition(_ == null)
        (nulls ++ vals.sortWith((a, b) =>
          a.asInstanceOf[Comparable[Any]].compareTo(b) < 0))
          .map(String.valueOf)
      }
    } finally up.unpersist(blocking = false)
  }

  /** Upsert COMPLETE (month, event_type) rollup rows into the at-rest store —
    * the monthly-rollup instantiation of [[upsert]], kept as the sink half
    * of streaming materialized-view maintenance
    * ([[graft.streaming.Streaming.maintainMonthlyRollup]]).
    */
  def upsertRollupRows(updates: DataFrame, outDir: String): Seq[String] =
    upsert(updates, Seq("month", "event_type"), "month", outDir)

  // -------------------------------------------------------------------
  // Manifest-committed store: closes [[upsert]]'s documented commit-window
  // caveat. Layout:
  //
  //   store/data/<partCol>=<val>/part-*.parquet   (append-only data files)
  //   store/_manifest/v00000001.txt               (one live-file path per line)
  //
  // A committed manifest version lists EXACTLY the live files; the commit
  // point is one atomic rename of the next manifest into place. Writers
  // only ever APPEND data files (never delete or rewrite), so a reader that
  // resolved manifest version N keeps reading version N's files undisturbed
  // while a writer stages version N+1 — mid-upsert it sees the complete old
  // content, after the rename the complete new content, never a mix (the
  // plain-parquet dynamic overwrite, by contrast, clears a touched
  // partition before its replacement lands). Unreferenced files accumulate
  // until [[vacuumManifested]]. Single-maintainer contract: one writer at a
  // time (the version-rename refuses to overwrite, so a concurrent writer
  // fails loudly rather than corrupting); rename atomicity holds on
  // HDFS-like filesystems — an S3 deployment swaps this for a conditional
  // PUT. This is the write-to-temp-then-swap layout the [[upsert]] scaladoc
  // points to, kept dependency-free; a production deployment with an ACID
  // table format available uses that instead.
  // -------------------------------------------------------------------

  private[graft] def fsFor(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  private val manifestRe = "^v(\\d{8})\\.txt$".r

  /** Latest committed manifest version, 0 if none. */
  private[graft] def latestManifestVersion(
      fs: org.apache.hadoop.fs.FileSystem,
      manifestDir: org.apache.hadoop.fs.Path): Long =
    if (!fs.exists(manifestDir)) 0L
    else fs.listStatus(manifestDir).iterator.map(_.getPath.getName)
      .collect { case manifestRe(v) => v.toLong }
      .foldLeft(0L)(math.max)

  /** Live data files (absolute paths) per the latest committed manifest. */
  private[graft] def liveFiles(spark: SparkSession, storeDir: String): Seq[String] = {
    val (fs, _) = fsFor(spark, storeDir)
    val mdir = new org.apache.hadoop.fs.Path(s"$storeDir/_manifest")
    val v = latestManifestVersion(fs, mdir)
    if (v == 0L) Nil
    else {
      val in = fs.open(new org.apache.hadoop.fs.Path(mdir, f"v$v%08d.txt"))
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty).map(rel => s"$storeDir/data/$rel").toList
      finally in.close()
    }
  }

  /** All committed parquet files currently under the data dir, as paths
    * RELATIVE to it (the manifest's key space).
    */
  private[graft] def dataFilesOnDisk(spark: SparkSession, storeDir: String): Set[String] = {
    val (fs, _) = fsFor(spark, storeDir)
    val dataPath = new org.apache.hadoop.fs.Path(s"$storeDir/data")
    if (!fs.exists(dataPath)) Set.empty
    else {
      val base = dataPath.toUri.getPath
      val out = Set.newBuilder[String]
      val it = fs.listFiles(dataPath, true)
      while (it.hasNext) {
        val f = it.next()
        val name = f.getPath.getName
        if (f.isFile && name.endsWith(".parquet") &&
            !name.startsWith("_") && !name.startsWith("."))
          out += f.getPath.toUri.getPath.stripPrefix(base).stripPrefix("/")
      }
      out.result()
    }
  }

  /** Read the store as of its latest committed manifest — the fenced read
    * path. In-flight (staged, uncommitted) files are invisible by
    * construction: they are on disk but not in any manifest.
    */
  def readManifested(spark: SparkSession, storeDir: String): DataFrame = {
    val files = liveFiles(spark, storeDir)
    require(files.nonEmpty, s"no committed manifest under $storeDir/_manifest")
    spark.read.option("basePath", s"$storeDir/data").parquet(files: _*)
  }

  /** [[upsert]] semantics (complete-values keyed MERGE, partition-pruned
    * carry) with a crash-atomic commit: stage the touched partitions'
    * replacement files as appends, then publish them with one manifest
    * rename. A crash anywhere before the rename leaves the previous version
    * fully intact (the orphaned staged files are invisible and reclaimed by
    * [[vacuumManifested]]); replaying the same batch after a successful
    * commit rewrites the same logical content (new files, same rows).
    *
    * @return the touched partition values (as strings), in natural order
    */
  def upsertManifested(updates: DataFrame, keyCols: Seq[String],
      partitionCol: String, storeDir: String): Seq[String] = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(keyCols.contains(partitionCol),
      s"partitionCol '$partitionCol' must be one of keyCols " +
        s"${keyCols.mkString("[", ", ", "]")} — otherwise a key that moves " +
        "partitions leaves its old row behind as a silent duplicate")
    val spark = updates.sparkSession
    val up = updates.persist()
    try {
      val touched = up.select(partitionCol).distinct()
        .collect().map(_.get(0)).toSeq
      if (touched.isEmpty) Nil
      else {
        val (fs, _) = fsFor(spark, storeDir)
        val mdir = new org.apache.hadoop.fs.Path(s"$storeDir/_manifest")
        val version = latestManifestVersion(fs, mdir)
        val live = liveFiles(spark, storeDir)
        val carried =
          if (live.isEmpty) up.limit(0)
          else antiJoinKeys(
            spark.read.option("basePath", s"$storeDir/data")
              .parquet(live: _*)
              .where(touchedFilter(partitionCol, touched)),
            up, keyCols)
        stageAndCommitPartitions(spark, carried.unionByName(up),
          partitionCol, storeDir, touched)
      }
    } finally up.unpersist(blocking = false)
  }

  /** Partition-scoped REBUILD commit (r14, VERDICT r13 #4): replace the
    * full content of the `touched` partitions with `rows`, crash-atomically
    * via the manifest. This is the refresh shape for stores whose
    * partition content derives WHOLESALE from an upstream corpus group —
    * the near-dup band index, a pack-group prep store: when a group's
    * membership changes (docs added, changed, REMOVED), the group is
    * recomputed from its current upstream truth and committed as a unit.
    * Key-carry upsert cannot express the removal half (a carried key is
    * exactly what retraction must drop); a rebuild retracts naturally.
    * Idempotent by construction — a replay recomputes identical content —
    * which is what makes crash-rerun-from-the-top safe for the prep chain
    * (PrepJobSpec). Partitions not in `touched` keep their exact files; a
    * touched partition with no rows in `rows` commits EMPTY (its old files
    * drop from the manifest). Rows outside the touched set are rejected
    * loudly — they would land in partitions the manifest doesn't re-list,
    * becoming invisible-but-stored orphans.
    */
  def rebuildPartitionsManifested(rows: DataFrame, partitionCol: String,
      storeDir: String, touched: Seq[Any]): Seq[String] = {
    require(touched.nonEmpty, "touched partition values must be non-empty")
    val spark = rows.sparkSession
    val r = rows.persist()
    try {
      val present = r.select(partitionCol).distinct().collect().map(_.get(0))
      // compare via the partition-ADDRESSING normalization (the same
      // partitionDirName stageAndCommitPartitions uses), not universal
      // equality on boxed values: a caller passing Seq(1L) for an int
      // partition column must match the partition its rows will land in,
      // not the runtime box (ADVICE r14)
      val touchedDirs = touched.map(partitionDirName(partitionCol, _)).toSet
      val stray = present.filterNot(p =>
        touchedDirs.contains(partitionDirName(partitionCol, p)))
      require(stray.isEmpty,
        s"rebuildPartitionsManifested: rows carry partition values outside " +
          s"the touched set: ${stray.take(5).mkString(", ")}")
      stageAndCommitPartitions(spark, r, partitionCol, storeDir, touched)
    } finally r.unpersist(blocking = false)
  }

  /** Apply a CDC change batch ([[applyCdc]] semantics: highest-seq wins,
    * a winning literal `"D"` deletes) to a manifest-committed store —
    * the keyed-store sibling of [[upsertManifested]], with DELETE support:
    * a deleted key simply doesn't appear in its partition's replacement
    * content, and a partition whose keys all die drops out of the manifest
    * entirely. Same crash-atomicity (a crash before the manifest rename
    * leaves the prior version intact) and the same replay idempotence
    * (latest-wins is stable under re-application — the at-least-once
    * contract [[graft.streaming.Streaming.materializeCdcStream]] relies
    * on). A fresh store (no manifest yet) treats the batch as the initial
    * snapshot load.
    *
    * @return the touched partition values (as strings), in natural order
    */
  def applyCdcManifested(changes: DataFrame, keyCols: Seq[String],
      opCol: String, seqCol: String, partitionCol: String,
      storeDir: String): Seq[String] = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(keyCols.contains(partitionCol),
      s"partitionCol '$partitionCol' must be one of keyCols " +
        s"${keyCols.mkString("[", ", ", "]")} — otherwise a change cannot " +
        "locate its key's at-rest partition")
    val spark = changes.sparkSession
    val ch = changes.persist()
    try {
      val touched = ch.select(partitionCol).distinct()
        .collect().map(_.get(0)).toSeq
      if (touched.isEmpty) Nil
      else {
        val live = liveFiles(spark, storeDir)
        val base =
          if (live.isEmpty) ch.drop(opCol, seqCol).limit(0)
          else spark.read.option("basePath", s"$storeDir/data")
            .parquet(live: _*)
            .where(touchedFilter(partitionCol, touched))
        val next = applyCdc(base, ch, keyCols, opCol, seqCol)
        stageAndCommitPartitions(spark, next, partitionCol, storeDir, touched)
      }
    } finally ch.unpersist(blocking = false)
  }

  /** Shared commit tail of [[upsertManifested]] / [[applyCdcManifested]]:
    * stage `content` (the full replacement rows of exactly the `touched`
    * partitions) as APPEND-only files — the files the current manifest
    * references are never touched — then publish ONE new manifest where
    * untouched partitions keep their old file lists and touched partitions
    * are exactly the staged files. Touched directories are derived from
    * the partition VALUES (Spark's own path escaping), not from the staged
    * files, so a touched partition whose replacement content is EMPTY
    * (every key deleted) still drops its old files from the manifest.
    */
  private def stageAndCommitPartitions(spark: SparkSession,
      content: DataFrame, partitionCol: String, storeDir: String,
      touched: Seq[Any]): Seq[String] = {
    val (fs, _) = fsFor(spark, storeDir)
    val mdir = new org.apache.hadoop.fs.Path(s"$storeDir/_manifest")
    val version = latestManifestVersion(fs, mdir)
    val live = liveFiles(spark, storeDir)

    val before = dataFilesOnDisk(spark, storeDir)
    content.write.mode("append").partitionBy(partitionCol)
      .parquet(s"$storeDir/data")
    val staged = (dataFilesOnDisk(spark, storeDir) -- before).toSeq.sorted

    val dataBase = s"$storeDir/data/"
    val touchedDirs = touched.map(partitionDirName(partitionCol, _)).toSet
    val kept = live.map(_.stripPrefix(dataBase))
      .filterNot(f => touchedDirs.contains(f.takeWhile(_ != '/')))
    val next = (kept ++ staged).sorted

    publishManifest(fs, mdir, version, next, storeDir)
    val (nulls, vals) = touched.partition(_ == null)
    (nulls ++ vals.sortWith((a, b) =>
      a.asInstanceOf[Comparable[Any]].compareTo(b) < 0))
      .map(String.valueOf)
  }

  /** The directory name Spark's partitioned writer produces for a value of
    * `partitionCol` — same escaping (`ExternalCatalogUtils.escapePathName`)
    * and the Hive NULL sentinel, so manifest bookkeeping can address a
    * partition it is ABOUT to delete without any staged file to learn the
    * name from.
    */
  private[graft] def partitionDirName(partitionCol: String, v: Any): String = {
    val s =
      if (v == null) "__HIVE_DEFAULT_PARTITION__"
      else org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .escapePathName(String.valueOf(v))
    s"$partitionCol=$s"
  }

  /** Atomically claim a manifest version slot: publish `tmp` as `target`,
    * failing (false) if the slot is already taken. On HDFS-like filesystems
    * `rename` refuses an existing destination, which is exactly the claim.
    * On `file:` schemes Hadoop's rename is POSIX rename(2) — it silently
    * REPLACES an existing destination — so the claim is a hard-link
    * creation instead, which is atomic and throws if the target exists
    * (the tmp copy is then removed; the link IS the published manifest).
    * On object stores without atomic rename (raw S3) neither holds — swap
    * in a conditional PUT there, as the class doc notes.
    */
  private[etl] def claimVersionSlot(fs: org.apache.hadoop.fs.FileSystem,
      tmp: org.apache.hadoop.fs.Path,
      target: org.apache.hadoop.fs.Path): Boolean =
    if (fs.getScheme == "file") {
      try {
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(target.toUri.getPath),
          java.nio.file.Paths.get(tmp.toUri.getPath))
        fs.delete(tmp, false)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    } else fs.rename(tmp, target)

  /** Reclaim data files no manifest version ≤ latest references… precisely:
    * delete every on-disk data file absent from the LATEST manifest, plus
    * all older manifest versions. Immediate reclamation — a production
    * deployment holds a grace window for readers pinned to older versions;
    * here the single-maintainer contract makes the latest version the only
    * live one.
    *
    * @return number of data files deleted
    */
  def vacuumManifested(spark: SparkSession, storeDir: String): Int = {
    val (fs, _) = fsFor(spark, storeDir)
    val mdir = new org.apache.hadoop.fs.Path(s"$storeDir/_manifest")
    val v = latestManifestVersion(fs, mdir)
    require(v > 0L, s"no committed manifest under $storeDir/_manifest")
    val keep = liveFiles(spark, storeDir)
      .map(_.stripPrefix(s"$storeDir/data/")).toSet
    val orphans = (dataFilesOnDisk(spark, storeDir) -- keep).toSeq.sorted
    orphans.foreach { rel =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$storeDir/data/$rel"), false)
    }
    if (fs.exists(mdir)) fs.listStatus(mdir).foreach { st =>
      st.getPath.getName match {
        case manifestRe(ver) if ver.toLong < v => fs.delete(st.getPath, false)
        case n if n.startsWith(".tmp-") => fs.delete(st.getPath, false)
        case _ => ()
      }
    }
    // IVF stores pair each manifest version with a `centroids_vNNNNNNNN`
    // sidecar dir ([[graft.operators.Ivf]]'s fence); superseded versions
    // and crashed-attempt temps are orphans exactly like old manifests
    // (r16, ADVICE r15 — they previously accumulated unboundedly). Flat
    // stores have no such dirs — the match is simply empty there. A
    // version ABOVE latest is a crashed attempt's staged sidecar (vacuum
    // runs under the same single-maintainer contract as mutations, so no
    // live writer owns it); its replay rewrites it from scratch.
    val sidecarRe = "^centroids_v(\\d{8})$".r
    val root = new org.apache.hadoop.fs.Path(storeDir)
    fs.listStatus(root).foreach { st =>
      st.getPath.getName match {
        case sidecarRe(ver) if ver.toLong != v => fs.delete(st.getPath, true)
        case n if n.startsWith("centroids_.tmp-") => fs.delete(st.getPath, true)
        case _ => ()
      }
    }
    orphans.size
  }

  /** Latest committed manifest version of a manifest store (0 = no store
    * yet) — the bootstrap probe for flat-manifest consumers like the
    * streaming LSH index ([[graft.streaming.Streaming.applyNearDedupBatch]]).
    */
  def manifestVersion(spark: SparkSession, storeDir: String): Long = {
    val (fs, _) = fsFor(spark, storeDir)
    latestManifestVersion(fs, new org.apache.hadoop.fs.Path(s"$storeDir/_manifest"))
  }

  /** Live data-file count per the latest committed manifest — the honest
    * "how fragmented is this store" metric (files on disk may include
    * uncommitted or orphaned ones).
    */
  def manifestFileCount(spark: SparkSession, storeDir: String): Int =
    liveFiles(spark, storeDir).size

  /** APPEND-shaped manifest commit for a FLAT (unpartitioned) store: stage
    * `rows` as new data files, then publish ONE manifest listing the old
    * live files plus the staged ones. Crash before the manifest rename ⇒
    * readers keep the previous version intact (staged files are invisible
    * orphans, reclaimed by [[vacuumManifested]]); there is never a moment
    * where the store is missing or torn — the failure mode the raw
    * append-to-dir layout cannot avoid during maintenance swaps.
    *
    * Concurrency scope (same single-maintainer contract as the whole
    * manifest store, stated precisely): the atomic version claim makes a
    * racing COMMIT loud, but staged files are identified by an on-disk
    * diff — two writers STAGING at once could absorb each other's
    * (possibly half-written) files into one manifest. One writer per store
    * at a time; the streaming gate satisfies this by construction
    * (foreachBatch bodies are serial, compaction runs between batches).
    */
  def appendManifested(rows: DataFrame, storeDir: String): Unit =
    commitFlat(rows, storeDir, replace = false)

  /** Full-content REPLACEMENT commit for a flat manifest store — the
    * compaction/OPTIMIZE primitive: stage `rows` (typically the store's own
    * content re-read and repartitioned) as new files, then publish a
    * manifest listing ONLY them. A reader resolving the manifest sees the
    * complete old content or the complete new content, never an absent or
    * half-swapped store — this closes the two-rename swap window a
    * plain-directory compaction has. Old files become orphans;
    * [[vacuumManifested]] reclaims them.
    */
  def replaceManifested(rows: DataFrame, storeDir: String,
      writeOptions: Map[String, String] = Map.empty): Unit =
    commitFlat(rows, storeDir, replace = true, writeOptions)

  private def commitFlat(rows: DataFrame, storeDir: String,
      replace: Boolean, writeOptions: Map[String, String] = Map.empty): Unit = {
    val spark = rows.sparkSession
    val (fs, _) = fsFor(spark, storeDir)
    val mdir = new org.apache.hadoop.fs.Path(s"$storeDir/_manifest")
    val version = latestManifestVersion(fs, mdir)
    val live = liveFiles(spark, storeDir).map(_.stripPrefix(s"$storeDir/data/"))
    val before = dataFilesOnDisk(spark, storeDir)
    rows.write.options(writeOptions).mode("append").parquet(s"$storeDir/data")
    val staged = (dataFilesOnDisk(spark, storeDir) -- before).toSeq.sorted
    val next = (if (replace) staged else (live ++ staged).sorted)
    publishManifest(fs, mdir, version, next, storeDir)
  }

  /** Shared commit point: write the next manifest aside, then ONE atomic
    * claim of the version slot (a lost claim = loud concurrent-writer
    * failure, never a corrupted store).
    */
  private[graft] def publishManifest(fs: org.apache.hadoop.fs.FileSystem,
      mdir: org.apache.hadoop.fs.Path, version: Long, lines: Seq[String],
      storeDir: String): Unit = {
    fs.mkdirs(mdir)
    val tmp = new org.apache.hadoop.fs.Path(mdir,
      s".tmp-${java.util.UUID.randomUUID()}")
    val os = fs.create(tmp, false)
    try os.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    finally os.close()
    val target = new org.apache.hadoop.fs.Path(mdir, f"v${version + 1}%08d.txt")
    if (!claimVersionSlot(fs, tmp, target)) {
      fs.delete(tmp, false)
      throw new IllegalStateException(
        s"manifest commit v${version + 1} lost a race — concurrent writer on $storeDir")
    }
  }

  /** Dynamic partition overwrite of a partitioned parquet dir: only the
    * partitions present in `df` are replaced (static overwrite mode would
    * delete every other partition on the way in). The mode is set as a
    * per-WRITER option, never by toggling the session conf: a set/restore
    * around the write races every concurrent writer in the session — the
    * restore landing mid-flight would flip another upsert to static mode,
    * which deletes every partition that writer doesn't carry.
    */
  /** Slowly-changing-dimension Type-2 merge: fold an update batch into a
    * versioned dimension, preserving full attribute history. `current`
    * carries the dimension with its version columns (`validFromCol`,
    * `validToCol`, `isCurrentCol`); `updates` carries the same key +
    * attribute columns plus `effTsCol`, the observation time.
    *
    * Semantics (all deterministic, all window-expressible — the batch twin
    * `q_scd2` sits under the full DuckDB oracle):
    *   - CLOSED history rows (valid_to set) pass through with only the
    *     is_current flag normalized to false;
    *   - open rows and updates stack per key, ordered by
    *     (ts, attrs) — the attr tie-break makes equal-timestamp batches
    *     reproducible instead of shuffle-dependent;
    *   - an update whose attributes null-safely equal its predecessor's is
    *     a NO-OP (dropped — re-observing an unchanged row must not cut a
    *     version; equality is transitive, so comparing against the
    *     immediate physical predecessor compresses whole unchanged runs);
    *   - each surviving version closes at the next one's start:
    *     `valid_to = lead(valid_from)`, open-ended ⇒ current;
    *   - unknown keys in `updates` insert their first version.
    *
    * Scale shape: ONE shuffle, keyed on the dimension key (two window
    * passes over the same partitioning — Catalyst plans one Exchange); the
    * closed-row leg is a pass-through union. Dimensions are the small side
    * of a star by construction, so the key window is never the job's
    * bottleneck; history length per key only grows the partition linearly.
    */
  /** Keyed diff between two corpus snapshots: per key, is the row `added`,
    * `removed`, `changed`, or `unchanged` from `prev` to `next`?
    *
    * This is the refresh driver for everything incremental downstream — a
    * re-crawl lands, and only the `added`/`changed` keys need to re-enter
    * the prep pipeline (dedup, quality, chunking) while `removed` keys are
    * retracted; re-processing the unchanged bulk is the cost this op
    * exists to avoid (the Delta-less snapshot diff; cf. the reference's
    * full-reload pattern, load/__init__.py:96-118, which this replaces at
    * scale). Content identity is md5 over PER-COLUMN md5s: hashing each
    * column first makes every fragment fixed-width hex, so no value can
    * imitate a separator or shift a boundary — `("ab","")` ≠ `("a","b")`,
    * and a value CONTAINING the separator char cannot collide (the
    * separator-in-value ambiguity every sentinel-concat scheme carries;
    * spec-pinned). NULL hashes to a literal `null` fragment, distinct
    * from `md5('')`, so `("a", NULL)` ≠ `("a", "")`.
    *
    * Shape at 100 TB: each side reduces to (key, 16-byte fingerprint)
    * AT THE SCAN — column pruning keeps payloads out of the exchange —
    * then ONE sort-merge full-outer join on the key. If both snapshots are
    * bucketed by the key ([[graft.etl.Load]]'s bucketed sink), the
    * exchange disappears entirely.
    */
  def snapshotDiff(prev: DataFrame, next: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && compareCols.nonEmpty,
      "need key and compare columns")
    def fp(df: DataFrame, alias: String) = df.select(
      keyCols.map(col) :+
        md5(concat_ws("|",
          compareCols.map(c =>
            coalesce(md5(col(c).cast("string")), lit("null"))): _*))
          .as(alias): _*)
    fp(prev, "fp_prev").join(fp(next, "fp_next"), keyCols, "full_outer")
      .select(keyCols.map(col) :+
        when(col("fp_prev").isNull, "added")
          .when(col("fp_next").isNull, "removed")
          .when(col("fp_prev") =!= col("fp_next"), "changed")
          .otherwise("unchanged").as("status"): _*)
  }

  def scdMerge(current: DataFrame, updates: DataFrame, keyCols: Seq[String],
      attrCols: Seq[String], effTsCol: String,
      validFromCol: String = "valid_from", validToCol: String = "valid_to",
      isCurrentCol: String = "is_current"): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty, "need key and attr columns")
    val outCols = (keyCols ++ attrCols ++ Seq(validFromCol, validToCol, isCurrentCol))
      .map(col)
    // openness derives from valid_to nullity, NOT the is_current flag: a
    // row whose flag is NULL (sloppy upstream writer) would match neither
    // where(!flag) nor where(flag) and silently vanish from the merge.
    // valid_to IS NULL has no such third state; is_current is recomputed
    // on BOTH legs so an inconsistent input flag heals instead of leaking
    val closed = current.where(col(validToCol).isNotNull)
      .withColumn(isCurrentCol, lit(false))
      .select(outCols: _*)
    val open = current.where(col(validToCol).isNull)
      .select((keyCols ++ attrCols).map(col) :+ col(validFromCol): _*)
    val incoming = updates
      .select((keyCols ++ attrCols).map(col) :+ col(effTsCol).as(validFromCol): _*)

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(validFromCol) +: attrCols.map(col): _*)
    val prevEq = attrCols
      .map(a => col(a) <=> lag(col(a), 1).over(w))
      .reduce(_ && _)
    val versions = open.unionByName(incoming)
      .withColumn("__dup", coalesce(lag(lit(true), 1).over(w), lit(false)) && prevEq)
      .where(!col("__dup"))
      .withColumn(validToCol, lead(col(validFromCol), 1).over(w))
      .withColumn(isCurrentCol, col(validToCol).isNull)
      .select(outCols: _*)
    versions.unionByName(closed)
  }

  /** Apply a CDC change batch (op ∈ I/U/D + a unique, monotonically
    * assigned sequence column — the LSN of a real change feed) to a keyed
    * snapshot: the HIGHEST-sequence change per key wins entirely; a winning
    * D removes the key, a winning I/U replaces (or inserts) the row's
    * attributes; keys without changes pass through untouched. I and U are
    * deliberately synonymous — change feeds routinely misreport one as the
    * other around retries, and latest-complete-row-wins makes replay
    * idempotent (re-applying the same batch is a no-op, same contract as
    * [[upsert]]). Anything that is not a literal `"D"` — including a NULL
    * or unrecognized op — applies as an upsert: a malformed feed row must
    * never silently DELETE data.
    *
    * Scale shape: one window shuffle over the CHANGE batch (≪ snapshot),
    * then one join on key — the anti-join side broadcasts when the batch is
    * small, and AQE picks the shuffle form past that. The snapshot is never
    * window-sorted. Batch twin `q_cdc_apply` sits under the full DuckDB
    * oracle.
    */
  def applyCdc(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
      opCol: String, seqCol: String): DataFrame = {
    val attrCols = base.columns.filterNot(keyCols.contains).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(seqCol).desc)
    val latest = changes
      .select((keyCols ++ attrCols).map(col) :+ col(opCol) :+ col(seqCol): _*)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
    val untouched = base.join(latest.select(keyCols.map(col): _*),
      keyCols, "left_anti")
    // only a literal 'D' deletes — null-safe, so a malformed change row
    // with a NULL (or unexpected) op applies as an upsert instead of
    // silently deleting the key (`=!= "D"` is NULL for NULL op, which
    // would drop the row from BOTH legs: the anti-join already removed
    // the key, and a NULL filter would exclude it here too)
    val applied = latest.where(!(col(opCol) <=> lit("D")))
      .select((keyCols ++ attrCols).map(col): _*)
    untouched.unionByName(applied)
  }

  private def writeDynamic(df: DataFrame, partitionCol: String,
      outDir: String): Unit =
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol).parquet(outDir)
}
