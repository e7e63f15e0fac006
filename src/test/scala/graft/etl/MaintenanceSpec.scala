package graft.etl

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.functions._

class MaintenanceSpec extends SparkSpec {

  test("readEvolved merges evolving schemas; old files yield NULL for new columns") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_evolve_").toString
    // generation 1: (id, a) — generation 2 adds column b
    Seq((1L, "x"), (2L, "y")).toDF("id", "a")
      .coalesce(1).write.parquet(s"$dir/g=1")
    Seq((3L, "z", 30L), (4L, "w", 40L)).toDF("id", "a", "b")
      .coalesce(1).write.parquet(s"$dir/g=2")

    val merged = Maintenance.readEvolved(spark, dir)
    assert(merged.columns.toSet == Set("id", "a", "b", "g"))
    assert(merged.count() == 4)
    // old generation's missing column is NULL, not an error, not garbage
    assert(merged.where($"g" === 1 && $"b".isNull).count() == 2)
    assert(merged.where($"g" === 2).agg(sum($"b")).head().getLong(0) == 70L)
    // plain read (no mergeSchema) picks ONE footer — the guard readEvolved exists for
    assert(spark.read.parquet(dir).columns.toSet != merged.columns.toSet ||
      merged.columns.toSet.subsetOf(spark.read.parquet(dir).columns.toSet))
  }

  test("compact collapses a many-small-file table to the computed target count") {
    val dir = Files.createTempDirectory("graft_compact_in_").toString
    val out = Files.createTempDirectory("graft_compact_out_").toString
    val df = graft.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    df.repartition(40).write.mode("overwrite").parquet(dir)
    val before = new java.io.File(dir).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(before >= 30, s"fixture should start fragmented, had $before files")

    // target sized so everything fits one file
    val planned = Maintenance.compact(spark, dir, out, targetBytes = 1L << 30)
    val after = new java.io.File(out).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(planned == 1 && after == 1, s"expected 1 output file, got $after")
    // content preserved exactly
    val a = spark.read.parquet(dir); val b = spark.read.parquet(out)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("compact sizes from files under PARTITION subdirs (recursive listing)") {
    val dir = Files.createTempDirectory("graft_compact_part_").toString
    val out = Files.createTempDirectory("graft_compact_part_out_").toString
    val df = graft.Tables.load(spark, "/root/testdata/sf0.001", "orders")
    df.withColumn("pri", substring(col("o_orderpriority"), 1, 1))
      .repartition(8).write.partitionBy("pri").mode("overwrite").parquet(dir)
    // a flat (non-recursive) listing would see 0 bytes here and plan 1 file
    // from an EMPTY size estimate — the recursive walk must find the real
    // bytes and the rewrite must preserve every row
    val planned = Maintenance.compact(spark, dir, out, targetBytes = 8L * 1024)
    assert(planned > 1,
      "planned=1 means the recursive listing found zero bytes under the partition dirs")
    val a = spark.read.parquet(dir); val b = spark.read.parquet(out)
    assert(a.count() == b.count())
    assert(a.drop("pri").exceptAll(b.drop("pri")).isEmpty)
  }

  test("ANALYZE TABLE feeds the CBO measured stats (rowCount visible in catalog)") {
    val df = graft.Tables.load(spark, "/root/testdata/sf0.001", "region")
    // clear any stale managed-table location from a previous test run
    spark.sql("DROP TABLE IF EXISTS maint_region")
    val loc = new java.io.File("target/spark-warehouse/maint_region")
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(loc)
    }
    df.write.mode("overwrite").saveAsTable("maint_region")
    Maintenance.analyzeTable(spark, "maint_region", Seq("r_regionkey"))
    // catalog-level truth: ANALYZE recorded exact row count + column stats
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier("maint_region"))
    assert(meta.stats.exists(_.rowCount.exists(_.toLong == df.count())),
      s"expected analyzed rowCount in catalog, got ${meta.stats}")
    assert(meta.stats.exists(_.colStats.contains("r_regionkey")),
      "expected column stats for r_regionkey")
    // plan-level: with CBO on, the optimizer sees the measured rowCount
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val stats = spark.table("maint_region").queryExecution.optimizedPlan.stats
      assert(stats.rowCount.exists(_.toLong == df.count()),
        s"CBO should read the analyzed rowCount, got ${stats.rowCount}")
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
  }

  test("general keyed upsert: replaces matched keys, carries the rest, " +
    "leaves untouched partitions byte-identical, and replays idempotently") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_upsert_").toString
    // an int partition axis + a composite row key — deliberately NOT the
    // month/event_type shape, to prove the axis generalizes
    val day1 = Seq(
      (1, "a", 10L), (1, "b", 11L),
      (2, "a", 20L), (2, "b", 21L),
      (3, "a", 30L)).toDF("scenario", "metric", "v")
    // first write: empty-store path
    assert(Maintenance.upsert(day1, Seq("scenario", "metric"), "scenario", out)
      == Seq("1", "2", "3"))

    def partFiles(): Map[String, Set[(String, Long)]] =
      new java.io.File(out).listFiles().filter(_.getName.startsWith("scenario="))
        .map(d => d.getName ->
          d.listFiles().filter(_.getName.endsWith(".parquet"))
            .map(f => (f.getName, f.lastModified())).toSet).toMap
    val before = partFiles()

    // day 2: replace (2, a), add (2, c); (2, b) must carry, 1 and 3 untouched
    val day2 = Seq((2, "a", 200L), (2, "c", 22L)).toDF("scenario", "metric", "v")
    assert(Maintenance.upsert(day2, Seq("scenario", "metric"), "scenario", out)
      == Seq("2"))

    val expected = Set(
      (1, "a", 10L), (1, "b", 11L),
      (2, "a", 200L), (2, "b", 21L), (2, "c", 22L),
      (3, "a", 30L))
    def readAll(): Set[(Int, String, Long)] =
      spark.read.parquet(out).select("scenario", "metric", "v")
        .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    assert(readAll() == expected)

    val after = partFiles()
    Seq("scenario=1", "scenario=3").foreach { d =>
      assert(after(d) == before(d), s"untouched partition $d was rewritten")
    }

    // at-least-once replay of the same complete-values batch: same contents
    Maintenance.upsert(day2, Seq("scenario", "metric"), "scenario", out)
    assert(readAll() == expected)
  }

  test("upsert rejects a partition axis outside the key (silent-duplicate " +
    "guard) and reports touched partitions in natural order") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_upsert_guard_").toString
    val rows = Seq((2, "a", 1L), (10, "a", 2L)).toDF("scenario", "metric", "v")
    // partitionCol ∉ keyCols: a moved key's old row would survive unseen
    val e = intercept[IllegalArgumentException] {
      Maintenance.upsert(rows, Seq("metric"), "scenario", out)
    }
    assert(e.getMessage.contains("must be one of keyCols"))
    // numeric axis: 2 < 10 in the axis' order, not "10" < "2" lexicographic
    assert(Maintenance.upsert(rows, Seq("scenario", "metric"), "scenario", out)
      == Seq("2", "10"))
  }

  test("manifest-committed upsert: a reader mid-upsert sees the old or the " +
    "new content in full, never a mix; vacuum reclaims orphans") {
    import spark.implicits._
    val store = Files.createTempDirectory("graft_manifest_").toString
    val day1 = Seq(
      (1, "a", 10L), (2, "a", 20L), (2, "b", 21L), (3, "a", 30L))
      .toDF("scenario", "metric", "v")
    assert(Maintenance.upsertManifested(day1, Seq("scenario", "metric"),
      "scenario", store) == Seq("1", "2", "3"))

    def readAll(): Set[(Int, String, Long)] =
      Maintenance.readManifested(spark, store).select("scenario", "metric", "v")
        .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    val v1 = Set((1, "a", 10L), (2, "a", 20L), (2, "b", 21L), (3, "a", 30L))
    assert(readAll() == v1)

    // MID-UPSERT WINDOW: stage day 2's replacement files exactly as the
    // writer would (appended data files, manifest NOT yet swapped). A
    // fenced reader must still see v1 in full — on the plain-parquet
    // dynamic-overwrite path this same window loses carried rows.
    Seq((2, "a", 200L), (2, "c", 22L), (2, "b", 21L))
      .toDF("scenario", "metric", "v")
      .write.mode("append").partitionBy("scenario").parquet(s"$store/data")
    assert(readAll() == v1,
      "reader saw staged-but-uncommitted files — the commit window leaks")

    // the staged-but-never-committed files are exactly what a crashed
    // writer leaves behind; vacuum reclaims them without touching v1
    assert(Maintenance.vacuumManifested(spark, store) > 0)
    assert(readAll() == v1)

    // the real day-2 upsert: replace (2,a), add (2,c), carry (2,b);
    // partitions 1 and 3 untouched
    val day2 = Seq((2, "a", 200L), (2, "c", 22L)).toDF("scenario", "metric", "v")
    assert(Maintenance.upsertManifested(day2, Seq("scenario", "metric"),
      "scenario", store) == Seq("2"))
    val v2 = Set((1, "a", 10L), (2, "a", 200L), (2, "b", 21L), (2, "c", 22L),
      (3, "a", 30L))
    assert(readAll() == v2)

    // v1's files are still on disk (append-only store) — a reader that had
    // already resolved v1's manifest keeps its snapshot; vacuum then
    // reclaims v1's superseded partition-2 files and old manifests
    val reclaimed = Maintenance.vacuumManifested(spark, store)
    assert(reclaimed > 0, "vacuum found no superseded files after an upsert")
    assert(readAll() == v2)

    // replay of the same complete-values batch converges to the same rows
    Maintenance.upsertManifested(day2, Seq("scenario", "metric"),
      "scenario", store)
    assert(readAll() == v2)
  }

  test("upsert into a NULL partition replaces matched keys and carries the " +
    "rest (isin-vs-NULL and equality-anti-join-vs-NULL traps)") {
    import spark.implicits._
    // null partition values land in __HIVE_DEFAULT_PARTITION__; a bare isin
    // carry filter never matches NULL (the partition would be replaced
    // without being read), and a plain equality anti-join never matches a
    // NULL key (the old row would be carried alongside its replacement as
    // a duplicate). Both upsert variants must get both right.
    val day1 = Seq(
      (Some(1), "a", 5L),
      (None, "a", 1L), (None, "b", 2L)).toDF("scenario", "metric", "v")
    val day2 = Seq((Option.empty[Int], "a", 10L)).toDF("scenario", "metric", "v")
    val expected = Set((None, "a", 10L), (None, "b", 2L), (Some(1), "a", 5L))

    val outPlain = Files.createTempDirectory("graft_upsert_null_").toString
    assert(Maintenance.upsert(day1, Seq("scenario", "metric"), "scenario",
      outPlain) == Seq("null", "1"))
    Maintenance.upsert(day2, Seq("scenario", "metric"), "scenario", outPlain)
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Option[Int], String, Long)] =
      df.select("scenario", "metric", "v").collect()
        .map(r => (if (r.isNullAt(0)) None else Some(r.getInt(0)),
          r.getString(1), r.getLong(2))).toSet
    assert(rows(spark.read.parquet(outPlain)) == expected)

    val store = Files.createTempDirectory("graft_manifest_null_").toString
    Maintenance.upsertManifested(day1, Seq("scenario", "metric"), "scenario", store)
    Maintenance.upsertManifested(day2, Seq("scenario", "metric"), "scenario", store)
    assert(rows(Maintenance.readManifested(spark, store)) == expected)
  }

  test("flat manifest store: append accumulates, replace swaps wholesale, " +
    "vacuum reclaims orphans without touching live content") {
    import spark.implicits._
    val store = Files.createTempDirectory("graft_flat_store_").toString
    def content(): Set[Int] =
      Maintenance.readManifested(spark, store).collect().map(_.getInt(0)).toSet
    Maintenance.appendManifested(Seq(1, 2).toDF("x").coalesce(1), store)
    Maintenance.appendManifested(Seq(3).toDF("x").coalesce(1), store)
    assert(content() == Set(1, 2, 3))
    val filesBefore = Maintenance.manifestFileCount(spark, store)
    assert(filesBefore >= 2) // two appends → at least two live files
    // replacement commits ONLY the new content; old files become invisible
    // orphans immediately (manifest semantics), reclaimed by vacuum
    Maintenance.replaceManifested(Seq(9, 10).toDF("x").coalesce(1), store)
    assert(content() == Set(9, 10))
    val reclaimed = Maintenance.vacuumManifested(spark, store)
    assert(reclaimed >= filesBefore,
      s"vacuum reclaimed $reclaimed, expected >= $filesBefore orphans")
    assert(content() == Set(9, 10)) // live content untouched by vacuum
  }

  test("manifest version slot can be claimed exactly once on the local FS " +
    "(concurrent-writer guard; POSIX rename would silently overwrite)") {
    val dir = Files.createTempDirectory("graft_claim_").toString
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def stage(name: String, content: String) = {
      val p = new org.apache.hadoop.fs.Path(dir, name)
      val os = fs.create(p, false)
      try os.write(content.getBytes("UTF-8")) finally os.close()
      p
    }
    val target = new org.apache.hadoop.fs.Path(dir, "v00000007.txt")
    assert(Maintenance.claimVersionSlot(fs, stage(".tmp-a", "writer-a"), target))
    // the loser must observe a taken slot, not silently replace the winner
    assert(!Maintenance.claimVersionSlot(fs, stage(".tmp-b", "writer-b"), target))
    val in = fs.open(target)
    val content = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    assert(content == "writer-a", s"loser overwrote the committed manifest: $content")
  }

  test("incremental rollup refresh rewrites ONLY the touched month partitions") {
    import spark.implicits._
    // the sf0.001 events all land in one month — synthesize a second month
    // by shifting a copy, so the fixture has both a touched and an
    // untouched partition
    val m1 = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select($"ts", $"event_type", $"value")
    val m2 = m1.withColumn("ts", expr("timestampadd(MONTH, 1, ts)"))
    val all = m1.unionByName(m2)
    val out = Files.createTempDirectory("graft_rollup_").toString

    // day 1: month 1 complete, month 2 only half-arrived
    Maintenance.writeMonthlyRollup(
      m1.unionByName(m2.where(hash($"ts") % 2 === 0)), out)

    def partFiles(): Map[String, Set[(String, Long)]] =
      new java.io.File(out).listFiles().filter(_.getName.startsWith("month="))
        .map(d => d.getName ->
          d.listFiles().filter(_.getName.endsWith(".parquet"))
            .map(f => (f.getName, f.lastModified())).toSet).toMap
    val before = partFiles()
    assert(before.size == 2, s"fixture must build 2 month partitions: $before")

    // day 2: month 2's other half arrives; refresh gets the COMPLETE
    // current data for month 2 (the caller contract)
    val touchedMonths = m2.select(date_format($"ts", "yyyy-MM").as("m"))
      .distinct().collect().map(_.getString(0)).toSet
    val rewritten = Maintenance.refreshMonthlyRollup(m2, out)
    assert(rewritten.toSet == touchedMonths)

    // result equals a from-scratch full rebuild…
    val got = spark.read.parquet(out)
      .select($"month", $"event_type", $"n_events", $"sum_value")
    val full = Maintenance.monthlyRollup(all)
    assert(got.count() == full.count())
    val diff = got.join(full, Seq("month", "event_type"))
      .where(got("n_events") =!= full("n_events") ||
        abs(got("sum_value") - full("sum_value")) > 1e-6)
    assert(diff.count() == 0, "refreshed rollup differs from a full rebuild")

    // …and every untouched month's files are bit-for-bit the day-1 files
    // (dynamic overwrite replaced only the touched partitions)
    val after = partFiles()
    val untouched = before.keySet.filterNot(d =>
      touchedMonths.contains(d.stripPrefix("month=")))
    assert(untouched.nonEmpty, "fixture must span more than the touched months")
    untouched.foreach { d =>
      assert(after(d) == before(d), s"untouched partition $d was rewritten")
    }
  }

  test("SCD2 merge: closed rows pass through, unchanged updates are no-ops, " +
    "changes cut versions, new keys insert, NULL attrs compare null-safely") {
    import spark.implicits._
    val d = (s: String) => java.sql.Date.valueOf(s)
    val current = Seq(
      // key 1: one closed + one open version
      (1L, Option("a"), d("2024-01-01"), Option(d("2024-02-01")), false),
      (1L, Option("b"), d("2024-02-01"), Option.empty[java.sql.Date], true),
      // key 2: open with NULL attr
      (2L, Option.empty[String], d("2024-01-15"), Option.empty[java.sql.Date], true))
      .toDF("k", "attr", "valid_from", "valid_to", "is_current")
    val updates = Seq(
      (1L, Option("b"), d("2024-03-01")), // unchanged → no-op
      (1L, Option("c"), d("2024-04-01")), // change → close b, open c
      (2L, Option.empty[String], d("2024-03-10")), // NULL == NULL → no-op
      (3L, Option("x"), d("2024-05-01"))) // new key → first version
      .toDF("k", "attr", "eff")

    val got = Maintenance.scdMerge(current, updates, Seq("k"), Seq("attr"), "eff")
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getDate(2).toString,
        Option(r.getDate(3)).map(_.toString), r.getBoolean(4)))
      .toSet
    val want = Set(
      (1L, Some("a"), "2024-01-01", Some("2024-02-01"), false), // closed, untouched
      (1L, Some("b"), "2024-02-01", Some("2024-04-01"), false), // closed by c
      (1L, Some("c"), "2024-04-01", None, true),
      (2L, None, "2024-01-15", None, true), // NULL no-op left it open
      (3L, Some("x"), "2024-05-01", None, true))
    assert(got === want)
    // exactly one current version per key
    val currents = got.toSeq.filter(_._5).groupBy(_._1).view.mapValues(_.size)
    assert(currents.toMap.values.forall(_ == 1))
  }

  test("CDC apply: latest sequence wins, deletes remove, inserts add, " +
    "untouched keys pass through, and replay is idempotent") {
    import spark.implicits._
    val base = Seq((1L, "one", 10.0), (2L, "two", 20.0), (3L, "three", 30.0))
      .toDF("k", "name", "bal")
    val changes = Seq(
      (1L, "one_v2", 11.0, "U", 100L),
      (1L, "one_v3", 12.0, "U", 200L), // later seq wins
      (2L, "ignored", 0.0, "U", 50L),
      (2L, "ignored2", 0.0, "D", 60L), // latest is D → key gone
      (4L, "four", 40.0, "I", 70L)) // insert of an unknown key
      .toDF("k", "name", "bal", "op", "seq")

    def snap(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Double)] =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet

    val once = Maintenance.applyCdc(base, changes, Seq("k"), "op", "seq")
    assert(snap(once) === Set(
      (1L, "one_v3", 12.0), (3L, "three", 30.0), (4L, "four", 40.0)))
    // at-least-once replay: applying the same batch to the result is a no-op
    val twice = Maintenance.applyCdc(once, changes, Seq("k"), "op", "seq")
    assert(snap(twice) === snap(once))
  }

  test("CDC-manifested store: bootstraps from the first batch, deletes drop " +
    "keys AND fully-emptied partitions, replay is a no-op, untouched " +
    "partition files stay byte-identical") {
    import spark.implicits._
    val store = Files.createTempDirectory("graft_cdc_store_").toString
    def read(): Set[(Long, Int, String)] =
      Maintenance.readManifested(spark, store)
        .select("k", "p", "v").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    def partFiles(p: Int): Map[String, Long] = {
      val d = new java.io.File(s"$store/data/p=$p")
      if (!d.exists()) Map.empty
      else d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }

    val b1 = Seq(
      (1L, 1, "a", "I", 10L), (2L, 1, "b", "I", 11L),
      (3L, 2, "c", "I", 12L), (4L, 2, "d", "I", 13L),
      (5L, 3, "e", "I", 14L))
      .toDF("k", "p", "v", "op", "seq")
    Maintenance.applyCdcManifested(b1, Seq("k", "p"), "op", "seq", "p", store)
    assert(read() === Set((1L, 1, "a"), (2L, 1, "b"), (3L, 2, "c"),
      (4L, 2, "d"), (5L, 3, "e")))
    val p3Before = partFiles(3)

    // update k1, delete ALL of partition 2 — its directory must drop out
    // of the manifest even though the replacement content stages no files
    val b2 = Seq(
      (1L, 1, "a2", "U", 20L),
      (3L, 2, "x", "D", 21L), (4L, 2, "y", "D", 22L))
      .toDF("k", "p", "v", "op", "seq")
    Maintenance.applyCdcManifested(b2, Seq("k", "p"), "op", "seq", "p", store)
    assert(read() === Set((1L, 1, "a2"), (2L, 1, "b"), (5L, 3, "e")))

    // at-least-once replay of the same batch: same logical content
    Maintenance.applyCdcManifested(b2, Seq("k", "p"), "op", "seq", "p", store)
    assert(read() === Set((1L, 1, "a2"), (2L, 1, "b"), (5L, 3, "e")))

    // the untouched partition's files were never rewritten
    assert(partFiles(3) === p3Before, "untouched partition p=3 was rewritten")
  }

  test("CDC apply: a NULL or unknown op never deletes — malformed feed " +
    "rows apply as upserts") {
    import spark.implicits._
    val base = Seq((1L, "one", 10.0)).toDF("k", "name", "bal")
    val changes = Seq(
      (1L, "one_null_op", 11.0, Option.empty[String], 100L), // NULL op wins
      (2L, "two_weird", 20.0, Option("X"), 50L)) // unknown op on a new key
      .toDF("k", "name", "bal", "op", "seq")
    val got = Maintenance.applyCdc(base, changes, Seq("k"), "op", "seq")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got === Set((1L, "one_null_op", 11.0), (2L, "two_weird", 20.0)))
  }

  test("SCD2 merge: a row with NULL is_current is never dropped — openness " +
    "derives from valid_to nullity") {
    import spark.implicits._
    val d = (s: String) => java.sql.Date.valueOf(s)
    val current = Seq(
      // NULL flag + NULL valid_to: must behave as the open version
      (1L, Option("a"), d("2024-01-01"), Option.empty[java.sql.Date],
        Option.empty[Boolean]),
      // NULL flag + set valid_to: must pass through as closed history
      (2L, Option("b"), d("2024-01-01"), Option(d("2024-02-01")),
        Option.empty[Boolean]),
      (2L, Option("c"), d("2024-02-01"), Option.empty[java.sql.Date],
        Option(true)))
      .toDF("k", "attr", "valid_from", "valid_to", "is_current")
    val updates = Seq((1L, Option("z"), d("2024-03-01")))
      .toDF("k", "attr", "eff")
    val got = Maintenance.scdMerge(current, updates, Seq("k"), Seq("attr"), "eff")
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getDate(2).toString,
        Option(r.getDate(3)).map(_.toString), r.getBoolean(4)))
      .toSet
    assert(got === Set(
      (1L, Some("a"), "2024-01-01", Some("2024-03-01"), false), // healed open → closed by z
      (1L, Some("z"), "2024-03-01", None, true),
      (2L, Some("b"), "2024-01-01", Some("2024-02-01"), false), // closed kept despite NULL flag
      (2L, Some("c"), "2024-02-01", None, true)))
  }

  test("snapshotDiff classifies every status and its fingerprint separates " +
    "NULL, empty, and separator-adjacent values") {
    import spark.implicits._
    val prev = Seq(
      (1L, Option("a"), Option("x")),   // unchanged
      (2L, Option("b"), Option("x")),   // changed (value edit)
      (3L, Option("c"), Option("x")),   // removed
      (4L, Option("a"), Option.empty[String]),  // NULL vs '' must be CHANGED
      (5L, Option("a|"), Option("")),   // value containing the separator
      (7L, Option("ab"), Option("")))   // boundary-shift trap
      .toDF("k", "v1", "v2")
    val next = Seq(
      (1L, Option("a"), Option("x")),
      (2L, Option("B"), Option("x")),
      (4L, Option("a"), Option("")),
      (5L, Option("a"), Option("|")),  // sentinel-concat schemes see 'a|'+''
                                       // == 'a'+'|' -- per-column md5 cannot
      (7L, Option("a"), Option("b")),  // 'ab'+'' == 'a'+'b' under bare concat
      (6L, Option("new"), Option("x")))    // added
      .toDF("k", "v1", "v2")
    val got = Maintenance.snapshotDiff(prev, next, Seq("k"), Seq("v1", "v2"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "changed", 5L -> "changed", 6L -> "added", 7L -> "changed"))
  }

  test("rebuildPartitionsManifested: touched values match by partition " +
    "ADDRESS, not runtime box — Seq(1L) vs an int column commits; a true " +
    "stray still rejects") {
    import spark.implicits._
    val store = Files.createTempDirectory("graft_rebuild_box_").toString
    val rows = Seq((1, "a"), (1, "b")).toDF("p", "v")
    // int column, Long touched values: dir names match (p=1), so this must
    // commit instead of rejecting every row as stray (ADVICE r14)
    Maintenance.rebuildPartitionsManifested(rows, "p", store, Seq(1L))
    assert(Maintenance.readManifested(spark, store).count() === 2)
    // a genuinely-untouched partition value still rejects loudly
    val ex = intercept[IllegalArgumentException] {
      Maintenance.rebuildPartitionsManifested(
        Seq((2, "c")).toDF("p", "v"), "p", store, Seq(1L))
    }
    assert(ex.getMessage.contains("outside the touched set"))
  }
}
