package graft.etl

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical nested-JSON summary export (SURVEY §3.3; reference
  * src/export_json.py). Deviations are deliberate and documented:
  * the reference HARDCODES the monthly seasonal pattern
  * (export_json.py:167-168) and peak demand (:188); here both are computed
  * honestly from the data (monthly GROUP BY, max hourly electric draw),
  * per SURVEY §2.6's fidelity note.
  */
object Export {

  /** Column-synonym resolution for the meter-like table
    * (reference: export_json.py:129-137).
    */
  private def resolve(df: DataFrame, wanted: Seq[String]): Option[String] =
    df.columns.find(c => wanted.exists(w => c.toLowerCase.contains(w)))

  /** Builds the summary document as a one-row nested DataFrame from a
    * registered star schema; serialize with [[writeSummaryJson]].
    *
    * The document describes ONE (building, scenario) — its `scenario` struct
    * is singular — so every aggregate (annual, monthly, peak, comfort) is
    * filtered to that pair. Default scope: the lexicographically-first
    * building and scenario (deterministic). The reference sums whatever
    * table it finds across all entities while attributing it to hardcoded
    * metadata (export_json.py:181-190) — a fidelity gap closed here, like
    * the hardcoded monthly pattern and peak.
    */
  def buildSummary(spark: SparkSession, schema: Map[String, DataFrame],
      co2FactorKgPerKwh: Double = 0.229,
      buildingId: Option[String] = None,
      scenarioId: Option[String] = None): DataFrame = {
    import spark.implicits._
    val dimTime = schema("dim_time").select($"time_key", $"timestamp", $"month")

    def one(df: DataFrame, keyCol: String, want: Option[String], what: String) = {
      val picked = want.map(v => df.where(col(keyCol) === v)).getOrElse(df)
        .orderBy(col(keyCol)).limit(1).collect()
      require(picked.nonEmpty,
        s"cannot export: no $what row${want.fold("")(v => s" for $keyCol=$v")}")
      picked.head
    }
    val bRow = one(schema("dim_building"), "building_id", buildingId, "dim_building")
    val sRow = one(schema("dim_scenario"), "scenario_id", scenarioId, "dim_scenario")
    val bId = bRow.getString(bRow.fieldIndex("building_id"))
    val sId = sRow.getString(sRow.fieldIndex("scenario_id"))

    val meters = schema("fact_meters")
      .where($"building_id" === bId && $"scenario_id" === sId)

    // column synonyms (reference S12/A3): tolerate renamed meter columns
    val eCol = resolve(meters, Seq("electric", "elec")).getOrElse("electric_kwh")
    val hCol = resolve(meters, Seq("heating", "heat")).getOrElse("heating_kwh")
    val cCol = resolve(meters, Seq("cooling", "cool")).getOrElse("cooling_kwh")

    val withMonth = meters.join(broadcast(dimTime), Seq("time_key"), "left")

    // annual totals (A3) + honestly-computed peak (max hourly electric,
    // kW ≈ kWh/h) + covered hours, one pass over the scoped fact
    val annualRow = withMonth.agg(
      sum(col(eCol)).as("electric"),
      sum(col(hCol)).as("heating"),
      sum(col(cCol)).as("cooling"),
      max(col(eCol)).as("peak"),
      count(lit(1)).as("n_rows"),
      countDistinct(col("time_key")).as("hours")).head()
    require(annualRow.getLong(4) > 0,
      s"cannot export: fact_meters has no rows for ($bId, $sId)")
    // an all-NULL measure column sums to NULL — report 0, don't NPE
    // (same dirty-data class Validate's plausibility check tolerates)
    def d(i: Int): Double = if (annualRow.isNullAt(i)) 0.0 else annualRow.getDouble(i)
    val (e, h, c, peak) = (d(0), d(1), d(2), d(3))
    val total = e + h + c
    val hours = annualRow.getLong(5)

    // honestly-computed monthly breakdown (A9); sorted on the driver —
    // collect_list order after a shuffle is not guaranteed
    // coalesce each sum: a month whose measure column is all-NULL must export
    // as 0.0, not NPE in getDouble below (same dirty-data class as `d` above)
    val monthly = withMonth
      .groupBy(col("month"))
      .agg(
        coalesce(sum(col(hCol)), lit(0.0)).as("heating_kwh"),
        coalesce(sum(col(cCol)), lit(0.0)).as("cooling_kwh"),
        (coalesce(sum(col(eCol)), lit(0.0)) + coalesce(sum(col(hCol)), lit(0.0))
          + coalesce(sum(col(cCol)), lit(0.0))).as("total_kwh"))
      // a NULL month group (meters row whose time_key missed dim_time) has
      // no place in a month-indexed breakdown; drop it rather than NPE
      .collect().filter(!_.isNullAt(0)).sortBy(_.getInt(0)).toSeq

    // comfort hours from this building's zones under this scenario (A5)
    val comfort = (schema.get("fact_zone_conditions"), schema.get("dim_zone")) match {
      case (Some(z), Some(dz)) =>
        val zoneKeys = dz.where($"building_id" === bId).select($"zone_key")
        val r = z.where($"scenario_id" === sId)
          .join(broadcast(zoneKeys), Seq("zone_key"), "left_semi")
          .agg(
            count(lit(1)).as("n"),
            count(when(abs(col("air_temp_C") - col("setpoint_C")) <= 1.0, 1)).as("ok"))
          .head()
        if (r.getLong(0) == 0) 0.0 else r.getLong(1).toDouble / r.getLong(0) * 100.0
      case _ => 0.0
    }

    val floorArea = bRow.getLong(bRow.fieldIndex("floor_area_m2")).toDouble
    renderSummaryDoc(spark,
      scenario = (sId, bRow.getString(bRow.fieldIndex("building_name")),
        bRow.getString(bRow.fieldIndex("location")), floorArea, s"$hours hours"),
      annual = (total, h, c, e),
      monthly = monthly.map(m => (m.getInt(0), m.getDouble(1), m.getDouble(2), m.getDouble(3))),
      kpis = (if (floorArea > 0) total / floorArea else 0.0,
        if (floorArea > 0) h / floorArea else 0.0,
        if (floorArea > 0) c / floorArea else 0.0,
        total * co2FactorKgPerKwh / 1000.0,
        if (floorArea > 0) total * co2FactorKgPerKwh / floorArea else 0.0,
        peak,
        comfort))
  }

  /** Shared document assembly: one-row nested frame in the canonical export
    * schema, used by [[buildSummary]] (star-schema path) and
    * [[summaryFromDir]] (S12 fallback path).
    */
  private def renderSummaryDoc(spark: SparkSession,
      scenario: (String, String, String, Double, String),
      annual: (Double, Double, Double, Double),
      monthly: Seq[(Int, Double, Double, Double)],
      kpis: (Double, Double, Double, Double, Double, Double, Double)): DataFrame = {
    import spark.implicits._
    val doc = Seq((
      "graft-spark",
      java.time.Instant.now().toString,
      scenario, annual, monthly, kpis))
      .toDF("pipeline", "generated_at", "scenario", "annual", "monthly_breakdown", "kpis")

    doc.select(
      $"pipeline",
      $"generated_at",
      $"scenario".cast("struct<name:string,building_type:string,location:string," +
        "floor_area_m2:double,simulation_period:string>"),
      struct(
        $"annual._1".as("total_kwh"),
        $"annual._2".as("heating_kwh"),
        $"annual._3".as("cooling_kwh"),
        $"annual._4".as("electric_kwh")).as("annual"),
      transform($"monthly_breakdown", m => struct(
        m.getField("_1").as("month"),
        m.getField("_2").as("heating_kwh"),
        m.getField("_3").as("cooling_kwh"),
        m.getField("_4").as("total_kwh"))).as("monthly_breakdown"),
      struct(
        $"kpis._1".as("energy_intensity_kwh_m2"),
        $"kpis._2".as("heating_intensity_kwh_m2"),
        $"kpis._3".as("cooling_intensity_kwh_m2"),
        $"kpis._4".as("annual_co2_tons"),
        $"kpis._5".as("co2_intensity_kg_m2"),
        $"kpis._6".as("peak_demand_kw"),
        $"kpis._7".as("comfort_hours_percent")).as("kpis"))
  }

  /** S12 — multi-source fallback reader (reference export_json.py:64-119):
    * tolerate a half-present artifacts directory by probing, first non-empty
    * source wins:
    *
    *   1. `*.parquet` under `dir/parquet/`, preferring file names containing
    *      `meter`/`energy` (all preferred files unioned by name);
    *   2. the session catalog — `vw_energy_summary`, then `fact_meters`,
    *      then the first listed table (the Spark analogue of the
    *      reference's DuckDB-file tier);
    *   3. any `*.parquet` or `*.csv` directly in `dir`, first readable.
    *
    * Unreadable candidates are skipped (the reference's try/except-per-file),
    * and an EMPTY source falls through to the next tier (`df.empty` check,
    * export_json.py:84,108). Paths go through the Hadoop FileSystem API, so
    * `dir` may live on any Spark-supported filesystem, not just local disk.
    */
  def resolveMeterSource(spark: SparkSession, dir: String): Option[DataFrame] = {
    import org.apache.hadoop.fs.Path
    val hconf = spark.sparkContext.hadoopConfiguration
    def ls(glob: String): Seq[Path] = {
      val p = new Path(glob)
      val fs = p.getFileSystem(hconf)
      Option(fs.globStatus(p)).map(_.toSeq.map(_.getPath)).getOrElse(Seq.empty)
    }
    // the emptiness probe (take(1) = a real scan) must run INSIDE the Try:
    // a candidate whose footer parses but whose data pages are corrupt
    // fails at scan time, and an unguarded probe would abort the whole
    // resolve instead of falling through to the next tier
    def nonEmpty(df: DataFrame): Option[DataFrame] =
      scala.util.Try(df.take(1).nonEmpty).toOption.filter(identity).map(_ => df)
    def tryRead(read: => DataFrame): Option[DataFrame] =
      scala.util.Try(read).toOption.flatMap(nonEmpty)

    val tier1 = {
      val all = ls(s"$dir/parquet/*.parquet")
      val preferred = all.filter { p =>
        val n = p.getName.toLowerCase
        n.contains("meter") || n.contains("energy")
      }
      val pick = if (preferred.nonEmpty) preferred else all
      if (pick.isEmpty) None
      else {
        val paths = pick.map(_.toString)
        // ONE multi-path scan when every footer agrees on the schema (one
        // FileScan node — partition planning packs all files together,
        // exactly how a 100-file artifact dir should read). The per-file
        // unionByName loop survives only as the ragged-schema fallback: a
        // multi-path read resolves its schema from one footer and would
        // silently NULL-fill or drop columns unique to the other files.
        val alignedSchema = if (paths.lengthCompare(1) > 0) scala.util.Try {
          val schemas = paths.map(p => spark.read.parquet(p).schema)
          Option.when(schemas.forall(_ == schemas.head))(schemas.head)
        }.toOption.flatten
        else None
        val single =
          if (paths.lengthCompare(1) == 0) tryRead(spark.read.parquet(paths.head))
          // hand the probe's verified schema to the packed read so it
          // doesn't re-infer from the same footers a second time
          else alignedSchema.flatMap(sch =>
            tryRead(spark.read.schema(sch).parquet(paths: _*)))
        single.orElse(tryRead(paths.map(p => spark.read.parquet(p))
          .reduce(_.unionByName(_, allowMissingColumns = true))))
      }
    }
    lazy val tier2 = Seq("vw_energy_summary", "fact_meters")
      .collectFirst { case t if spark.catalog.tableExists(t) => spark.table(t) }
      .orElse(spark.catalog.listTables().collect()
        .sortBy(_.name).headOption.map(t => spark.table(t.name)))
      .flatMap(nonEmpty)
    lazy val tier3 =
      (ls(s"$dir/*.parquet").map(p => () => spark.read.parquet(p.toString)) ++
        ls(s"$dir/*.csv").map(p => () => spark.read
          .option("header", "true").option("inferSchema", "true").csv(p.toString)))
        .view.flatMap(f => tryRead(f())).headOption

    tier1.orElse(tier2).orElse(tier3)
  }

  /** Reference's column-synonym lists (export_json.py:124-127). */
  private val heatingSyn = Seq("heating", "heat")
  private val coolingSyn = Seq("cooling", "cool")
  private val electricSyn = Seq("electric", "elec", "power")
  private val totalSyn = Seq("total")

  /** S12 — summary export over whatever [[resolveMeterSource]] found: a flat
    * meter-like table rather than a registered star schema. Aggregates via
    * the same column-synonym resolution as [[buildSummary]]; when heating +
    * cooling + electric all resolve to zero, falls back to a `total`-like
    * column (reference export_json.py:144-146). The monthly breakdown is
    * derived honestly when the source carries a `month` column or any
    * timestamp column — and is otherwise EMPTY, never the reference's
    * hardcoded seasonal pattern; likewise no data at all throws instead of
    * fabricating the sample document (export_json.py:192-227) — the same
    * documented fidelity deviation as the star path's peak/monthly.
    *
    * Scenario metadata is caller-supplied ([[FlatScenario]]): a flat table
    * has no dim_building to read floor area from, so intensity KPIs are 0.0
    * unless the caller provides the area.
    */
  final case class FlatScenario(
      name: String = "unknown",
      buildingType: String = "unknown",
      location: String = "unknown",
      floorAreaM2: Double = 0.0,
      simulationPeriod: String = "unknown")

  def summaryFromDir(spark: SparkSession, dir: String,
      co2FactorKgPerKwh: Double = 0.229,
      scenario: FlatScenario = FlatScenario()): DataFrame = {
    val df = resolveMeterSource(spark, dir).getOrElse(throw new IllegalArgumentException(
      s"cannot export: no non-empty meter-like source under $dir " +
        "(parquet/ glob, catalog views/tables, or loose parquet/csv)"))

    val eCol = resolve(df, electricSyn)
    val hCol = resolve(df, heatingSyn)
    val cCol = resolve(df, coolingSyn)
    def sumOf(c: Option[String]) =
      c.map(n => coalesce(sum(col(n).cast("double")), lit(0.0))).getOrElse(sum(lit(0.0)))

    val a = df.agg(
      sumOf(eCol).as("e"), sumOf(hCol).as("h"), sumOf(cCol).as("c"),
      eCol.map(n => coalesce(max(col(n).cast("double")), lit(0.0)))
        .getOrElse(max(lit(0.0))).as("peak"),
      sumOf(resolve(df, totalSyn)).as("t")).head()
    val (e, h, c, peak) = (a.getDouble(0), a.getDouble(1), a.getDouble(2), a.getDouble(3))
    val total = if (e + h + c > 0.0) e + h + c else a.getDouble(4)

    // honest monthly: a month column, else any timestamp column, else none
    val monthExpr = df.columns.find(_.equalsIgnoreCase("month"))
      .map(n => col(n).cast("int"))
      .orElse(df.schema.fields
        .find(_.dataType == org.apache.spark.sql.types.TimestampType)
        .map(f => month(col(f.name))))
    val monthly = monthExpr match {
      case Some(m) =>
        df.groupBy(m.as("month"))
          .agg(sumOf(hCol).as("h"), sumOf(cCol).as("c"),
            (sumOf(hCol) + sumOf(cCol) + sumOf(eCol)).as("t"))
          .collect().filter(!_.isNullAt(0)).sortBy(_.getInt(0))
          .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSeq
      case None => Seq.empty
    }

    val area = scenario.floorAreaM2
    renderSummaryDoc(spark,
      scenario = (scenario.name, scenario.buildingType, scenario.location,
        area, scenario.simulationPeriod),
      annual = (total, h, c, e),
      monthly = monthly,
      kpis = (if (area > 0) total / area else 0.0,
        if (area > 0) h / area else 0.0,
        if (area > 0) c / area else 0.0,
        total * co2FactorKgPerKwh / 1000.0,
        if (area > 0) total * co2FactorKgPerKwh / area else 0.0,
        peak,
        0.0))
  }

  /** Serializes the one-row summary to a pretty JSON document
    * (reference S11: json.dump(indent=2)).
    */
  def writeSummaryJson(summary: DataFrame, outPath: String): Unit = {
    val json = summary.toJSON.head()
    // pretty-print via Jackson (ships with Spark)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val pretty = mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsString(mapper.readTree(json))
    // a bare filename has no parent component — createDirectories(null) NPEs
    Option(Paths.get(outPath).getParent).foreach(Files.createDirectories(_))
    Files.writeString(Paths.get(outPath), pretty)
  }

  /** Schema gate over an exported document (reference: validate_json.py:29-79):
    * required fields present with the right JSON types. Returns error list
    * (empty = valid).
    */
  def validateSummaryJson(path: String): Seq[String] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(Files.readString(Paths.get(path)))
    val errors = scala.collection.mutable.Buffer[String]()
    def need(path: String, pred: com.fasterxml.jackson.databind.JsonNode => Boolean): Unit = {
      val node = path.split('.').foldLeft(Option(root)) {
        case (Some(n), f) => Option(n.get(f))
        case (None, _) => None
      }
      node match {
        case Some(n) if pred(n) => ()
        case Some(_) => errors += s"wrong type at $path"
        case None => errors += s"missing field: $path"
      }
    }
    need("pipeline", _.isTextual)
    need("generated_at", _.isTextual)
    need("scenario.name", _.isTextual)
    need("scenario.location", _.isTextual)
    need("scenario.floor_area_m2", _.isNumber)
    need("annual.total_kwh", _.isNumber)
    need("annual.heating_kwh", _.isNumber)
    need("annual.cooling_kwh", _.isNumber)
    // an EMPTY array is a legitimate export (summaryFromDir documents it for
    // flat sources with no month/timestamp column — the honest alternative
    // to the reference's fabricated seasonal pattern), so only the TYPE is
    // gated here; per-element checks below still run when entries exist
    need("monthly_breakdown", _.isArray)
    need("kpis.energy_intensity_kwh_m2", _.isNumber)
    need("kpis.annual_co2_tons", _.isNumber)
    need("kpis.peak_demand_kw", _.isNumber)
    need("kpis.comfort_hours_percent", _.isNumber)
    if (root.has("monthly_breakdown") && root.get("monthly_breakdown").isArray) {
      val it = root.get("monthly_breakdown").elements()
      var i = 0
      while (it.hasNext) {
        val m = it.next()
        Seq("month", "heating_kwh", "cooling_kwh", "total_kwh").foreach { f =>
          if (!m.has(f) || !m.get(f).isNumber)
            errors += s"monthly_breakdown[$i]: missing/invalid $f"
        }
        i += 1
      }
    }
    errors.toSeq
  }

  /** JSON-Lines corpus sink — the training-data interchange format (one
    * JSON object per line; every tokenizer/loader stack reads it).
    * `gzip = true` writes .json.gz shards, the on-the-wire norm for text
    * corpora (JSONL compresses 5-10×; Spark reads the shards back with
    * codec auto-detection, splittability traded away per shard — size
    * shards via upstream repartition, not file splits). Column order in
    * each object follows the DataFrame schema, so a stable `select`
    * upstream gives byte-stable lines for downstream checksumming.
    */
  def writeJsonl(df: DataFrame, outDir: String, gzip: Boolean = false): Unit = {
    val w = df.write.mode("overwrite")
    (if (gzip) w.option("compression", "gzip") else w).json(outDir)
  }

  /** Read a JSONL directory under an EXPLICIT schema. Schema-on-read
    * inference is a full extra pass over 100 TB and quietly widens types
    * (ints→bigints, mixed→string); the declared-schema contract matches
    * the engine's CSV stance (Extract's FAILFAST reader). Fields absent
    * from a line surface as NULLs; extra fields are ignored.
    */
  def readJsonl(spark: SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(dir)
}
