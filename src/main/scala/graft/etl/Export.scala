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
    val monthly = withMonth
      .groupBy(col("month"))
      .agg(
        sum(col(hCol)).as("heating_kwh"),
        sum(col(cCol)).as("cooling_kwh"),
        (sum(col(eCol)) + sum(col(hCol)) + sum(col(cCol))).as("total_kwh"))
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
    val doc = Seq((
      "graft-spark",
      java.time.Instant.now().toString,
      (sId, bRow.getString(bRow.fieldIndex("building_name")),
        bRow.getString(bRow.fieldIndex("location")), floorArea, s"$hours hours"),
      (total, h, c, e),
      monthly.map(m => (m.getInt(0), m.getDouble(1), m.getDouble(2), m.getDouble(3))),
      (if (floorArea > 0) total / floorArea else 0.0,
        if (floorArea > 0) h / floorArea else 0.0,
        if (floorArea > 0) c / floorArea else 0.0,
        total * co2FactorKgPerKwh / 1000.0,
        if (floorArea > 0) total * co2FactorKgPerKwh / floorArea else 0.0,
        peak,
        comfort)))
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

  /** Serializes the one-row summary to a pretty JSON document
    * (reference S11: json.dump(indent=2)).
    */
  def writeSummaryJson(summary: DataFrame, outPath: String): Unit = {
    val json = summary.toJSON.head()
    // pretty-print via Jackson (ships with Spark)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val pretty = mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsString(mapper.readTree(json))
    Files.createDirectories(Paths.get(outPath).getParent)
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
    need("monthly_breakdown", n => n.isArray && n.size() > 0)
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
}
