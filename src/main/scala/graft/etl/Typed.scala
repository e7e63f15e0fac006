package graft.etl

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}

/** Typed `Dataset[T]` views of the star schema (SURVEY §1.4: case-class
  * Encoders where type safety helps). The case classes ARE the schema
  * contract in code form — `as[T]` fails analysis on any drift between a
  * table and its declared shape, which is the point: downstream jobs that
  * compile against these types can't silently read a reshaped table.
  *
  * Join keys and `cop_proxy` are `Option`s: facts reach dims by LEFT join
  * (reference `how='left'`), so unmatched rows legitimately carry NULLs.
  */
object Typed {

  final case class DimBuilding(building_id: String, building_name: String,
      location: String, floor_area_m2: Long)
  final case class DimScenario(scenario_id: String, description: String)
  final case class DimZone(zone_key: Long, building_id: String,
      zone_id: String, zone_name: String)
  final case class DimAhu(ahu_key: Long, building_id: String, ahu_id: String)
  final case class DimTime(time_key: Long, timestamp: Timestamp, year: Int,
      month: Int, day: Int, hour: Int, dow: Int, is_weekend: Boolean)
  final case class FactZoneConditions(time_key: Option[Long],
      zone_key: Option[Long], scenario_id: String, air_temp_C: Double,
      setpoint_C: Double, co2_ppm: Double, rh_pct: Double)
  final case class FactHvac(time_key: Option[Long], ahu_key: Option[Long],
      scenario_id: String, supply_temp_C: Double, return_temp_C: Double,
      power_kw: Double, cooling_kw: Double, heating_kw: Double,
      cop_proxy: Option[Double])
  final case class FactMeters(time_key: Option[Long], building_id: String,
      scenario_id: String, electric_kwh: Double, heating_kwh: Double,
      cooling_kwh: Double)
  final case class FactWeather(time_key: Option[Long], building_id: String,
      drybulb_C: Double, relhum_pct: Double, ghi_W_m2: Double)

  /** The full star schema, typed. Keys match [[Transform]]'s table names. */
  final case class Star(
      dimBuilding: Dataset[DimBuilding],
      dimScenario: Dataset[DimScenario],
      dimZone: Dataset[DimZone],
      dimAhu: Dataset[DimAhu],
      dimTime: Dataset[DimTime],
      factZoneConditions: Dataset[FactZoneConditions],
      factHvac: Dataset[FactHvac],
      factMeters: Dataset[FactMeters],
      factWeather: Dataset[FactWeather])

  /** Lift an untyped `Map[String, DataFrame]` star schema (from
    * [[Transform.transformAll]] or [[Load.loadParquetDir]]-read tables)
    * into typed Datasets. Analysis-time failure on any schema drift.
    */
  def from(schema: Map[String, DataFrame]): Star = {
    val spark = schema.head._2.sparkSession
    import spark.implicits._
    Star(
      dimBuilding = schema("dim_building").as[DimBuilding],
      dimScenario = schema("dim_scenario").as[DimScenario],
      dimZone = schema("dim_zone").as[DimZone],
      dimAhu = schema("dim_ahu").as[DimAhu],
      dimTime = schema("dim_time").as[DimTime],
      factZoneConditions = schema("fact_zone_conditions").as[FactZoneConditions],
      factHvac = schema("fact_hvac").as[FactHvac],
      factMeters = schema("fact_meters").as[FactMeters],
      factWeather = schema("fact_weather").as[FactWeather])
  }
}
