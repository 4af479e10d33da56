package graft.etl

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Typed `Dataset[Activity]` facade over the cleaned-activity surface
  * (SURVEY §1.3: untyped DataFrame core for the dynamic transform
  * columns, case-class boundaries where callers want compile-time
  * safety). The encoder is derived from the case class, so a schema
  * drift between [[CleanActivities]] and this facade fails at the
  * `.as[Activity]` analysis boundary instead of at runtime deep in a
  * job.
  *
  * Fields mirror clean_raw_activities' output
  * (reference strava_sdk.py:266-291); Option[_] marks the fields the
  * reference allows to be absent.
  */
object TypedActivities {

  case class Activity(
      activity_id: Long,
      name: Option[String],
      activity_type: Option[String],
      epoch: Long,
      username: String,
      user_id: Option[Long],
      distance: Double,
      duration: Option[Long],
      elapsed_time: Long,
      avg_speed: Double,
      max_speed: Double,
      avg_power: Double,
      max_power: Double,
      avg_heartrate: Double,
      max_heartrate: Double,
      elevation: Double,
      is_commute: Boolean,
      gear_id: String,
      polyline: String)

  /** Cleaned rows (CleanActivities.clean, `_valid` filtered) as a typed
    * Dataset. */
  def from(cleaned: DataFrame): Dataset[Activity] = {
    val spark = cleaned.sparkSession
    import spark.implicits._
    cleaned.select(
      col("activity_id"), col("name"), col("activity_type"), col("epoch"),
      col("username"), col("user_id"), col("distance"), col("duration"),
      col("elapsed_time"), col("avg_speed"), col("max_speed"),
      col("avg_power"), col("max_power"), col("avg_heartrate"),
      col("max_heartrate"), col("elevation"), col("is_commute"),
      col("gear_id"), col("polyline"))
      .as[Activity]
  }
}
