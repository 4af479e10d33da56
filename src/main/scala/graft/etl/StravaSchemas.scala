package graft.etl

import org.apache.spark.sql.types._

/** Authoritative schemas for the Strava pipeline surface, derived from
  * the reference's field-by-field extraction (FIXTURES.md §A; citations
  * into /root/reference).
  */
object StravaSchemas {

  /** Raw Strava activity JSON — fields read by clean_raw_activities
    * (strava_sdk.py:203-264). All nullable; absence handled by the
    * cleaning projection's defaults. */
  val rawActivity: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("type", StringType),
    StructField("start_date", StringType), // yyyy-MM-dd'T'HH:mm:ss'Z' UTC
    StructField("athlete", StructType(Seq(StructField("id", LongType)))),
    // Stamped by the fetch layer: the reference threads the loop's
    // username into every sink row (main.py:19,172); a declarative job
    // needs that key in-band. Absent -> athlete id string (see clean).
    StructField("username", StringType),
    StructField("total_elevation_gain", DoubleType),
    StructField("distance", DoubleType),
    StructField("moving_time", LongType),
    StructField("elapsed_time", LongType),
    StructField("commute", BooleanType),
    StructField("gear_id", StringType),
    StructField("map", StructType(Seq(
      StructField("summary_polyline", StringType),
      StructField("polyline", StringType)))),
    StructField("start_latlng", ArrayType(DoubleType)),
    StructField("end_latlng", ArrayType(DoubleType)),
    StructField("max_speed", DoubleType),
    StructField("average_speed", DoubleType),
    StructField("max_watts", DoubleType),
    StructField("average_watts", DoubleType),
    StructField("max_heartrate", DoubleType),
    StructField("average_heartrate", DoubleType)))

  /** Cleaned activity record (strava_sdk.py:266-291). */
  val activity: StructType = StructType(Seq(
    StructField("activity_id", LongType),
    StructField("name", StringType),
    StructField("activity_type", StringType),
    StructField("epoch", LongType),
    StructField("timenow", DoubleType),
    StructField("timestamp", StringType),
    StructField("user_id", LongType),
    StructField("username", StringType),
    StructField("elevation", DoubleType),
    StructField("distance", DoubleType),
    StructField("duration", LongType),
    StructField("elapsed_time", LongType),
    StructField("max_speed", DoubleType),
    StructField("avg_speed", DoubleType),
    StructField("max_power", DoubleType),
    StructField("avg_power", DoubleType),
    StructField("max_heartrate", DoubleType),
    StructField("avg_heartrate", DoubleType),
    StructField("is_commute", BooleanType),
    StructField("start_lat", DoubleType),
    StructField("start_lng", DoubleType),
    StructField("end_lat", DoubleType),
    StructField("end_lng", DoubleType),
    StructField("polyline", StringType),
    StructField("gear_id", StringType)))

  /** Long-form activity streams: one row per sample
    * (strava_sdk.py:130-181; channel keys at :137, synthesized
    * time_key/original at :164-172). */
  val streamSample: StructType = StructType(Seq(
    StructField("activity_id", LongType),
    StructField("time", LongType),
    StructField("latlng", ArrayType(DoubleType)),
    StructField("distance", DoubleType),
    StructField("altitude", DoubleType),
    StructField("velocity_smooth", DoubleType),
    StructField("heartrate", DoubleType),
    StructField("cadence", DoubleType),
    StructField("watts", DoubleType),
    StructField("temp", DoubleType),
    StructField("moving", BooleanType),
    StructField("grade_smooth", DoubleType)))

  /** Numeric channels that pandas would interpolate/roll over. */
  val numericChannels: Seq[String] = Seq("distance", "altitude",
    "velocity_smooth", "heartrate", "cadence", "watts", "temp", "grade_smooth")

  /** Wide channel-dict document (one per activity, parallel arrays —
    * the shape strava_sdk.py:129-181 assembles and main.py:50 pivots):
    * `time` plus one array per [[streamSample]] channel. Shared by the
    * file-backed reader ([[graft.sources.StravaJsonSource.streams]])
    * and the REST fetch bridge ([[graft.sources.StravaClient]]), so
    * both paths parse identically. */
  val streamDictSchema: StructType = StructType(
    StructField("activity_id", LongType) +:
      StructField("time", ArrayType(LongType)) +:
      streamSample.fields.toSeq
        .filterNot(f => f.name == "activity_id" || f.name == "time")
        .map(f => StructField(f.name, ArrayType(f.dataType))))

  /** Sink `streams` element — the include-list at main.py:71. */
  val includeList: Seq[String] = Seq("watts", "cadence", "heartrate",
    "altitude", "temp", "velocity_smooth", "grade_smooth", "distance",
    "latlng", "time_new")

  /** Rolling window sizes (main.py:83). */
  val rollingWindows: Seq[Int] = Seq(1, 5, 10, 20, 30, 45, 60, 120, 300, 600, 1200)

  /** Users dimension (firebase_functions.py:23-27,54-60). */
  val user: StructType = StructType(Seq(
    StructField("username", StringType),
    StructField("password_hash", StringType),
    StructField("strava_code", StringType),
    StructField("access_token", StringType),
    StructField("refresh_token", StringType),
    StructField("expires_at", DoubleType)))
}
