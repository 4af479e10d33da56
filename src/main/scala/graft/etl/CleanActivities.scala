package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** P1 record normalization — the Spark form of `clean_raw_activities`
  * (reference strava_sdk.py:203-293): one schema-normalizing projection
  * with per-field defaults instead of 90 lines of try/except.
  *
  * Differences from the reference, by design (SURVEY §1.4 / C4):
  * a malformed record is NOT silently dropped — `from_json` in
  * PERMISSIVE mode yields nulls and `_valid` marks rows missing
  * required fields, so error handling is explicit and auditable.
  */
object CleanActivities {

  /** @param raw      one JSON document per row in column `json`
    * @param nowEpoch injected clock (reference uses time.time();
    *                 injection keeps the pipeline deterministic/testable)
    */
  def clean(raw: DataFrame, nowEpoch: Double): DataFrame = {
    val a = from_json(col("json"), StravaSchemas.rawActivity).as("a")
    val parsed = raw.select(a).select("a.*")
    parsed.select(
      col("id").as("activity_id"),                                     // strava_sdk.py:206
      col("name"),                                                     // :207
      col("type").as("activity_type"),                                 // :208
      // 'X' parses the trailing Z as an explicit UTC offset, so the
      // result is session-timezone-independent (the reference pins
      // TZ=UTC process-wide, strava_sdk.py:9; a quoted-'Z' pattern
      // would silently parse in the session zone instead).
      unix_timestamp(col("start_date"), "yyyy-MM-dd'T'HH:mm:ssX")
        .as("epoch"),                                                  // :210 (P2)
      lit(nowEpoch).as("timenow"),
      col("start_date").as("timestamp"),                               // :209
      col("athlete.id").as("user_id"),                                 // :211
      // fetch-layer username stamp (main.py:19,172); athlete id string
      // when the stamp is absent — a user key that survives legacyCompat
      coalesce(col("username"), col("athlete.id").cast("string"))
        .as("username"),
      coalesce(col("total_elevation_gain"), lit(0.0)).as("elevation"), // :212
      coalesce(col("distance"), lit(0.0)).as("distance"),              // :213
      col("moving_time").as("duration"),                               // :214
      col("elapsed_time"),                                             // :215
      coalesce(col("max_speed"), lit(0.0)).as("max_speed"),            // :239-242
      coalesce(col("average_speed"), lit(0.0)).as("avg_speed"),        // :244-247
      coalesce(col("max_watts"), lit(0.0)).as("max_power"),            // :249-252
      coalesce(col("average_watts"), lit(0.0)).as("avg_power"),        // :254-257
      coalesce(col("max_heartrate"), lit(0.0)).as("max_heartrate"),    // :259-262
      coalesce(col("average_heartrate"), lit(0.0)).as("avg_heartrate"),
      coalesce(col("commute"), lit(false)).as("is_commute"),           // :216
      coalesce(element_at(col("start_latlng"), 1), lit(0.0)).as("start_lat"), // :228-231
      coalesce(element_at(col("start_latlng"), 2), lit(0.0)).as("start_lng"),
      coalesce(element_at(col("end_latlng"), 1), lit(0.0)).as("end_lat"),     // :233-237
      coalesce(element_at(col("end_latlng"), 2), lit(0.0)).as("end_lng"),
      coalesce(col("map.summary_polyline"), lit("na")).as("polyline"), // :223-226
      coalesce(col("gear_id"), lit("na")).as("gear_id"),               // :218-221
      (col("id").isNotNull && col("start_date").isNotNull
        && col("elapsed_time").isNotNull).as("_valid"))
  }
}
