package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.{CleanActivities, StravaSchemas}

/** Source adapter for Strava-shaped data — the driver-fetch seam for
  * the reference's REST scans (S4/S5/S6, strava_sdk.py:85-181).
  *
  * In production the fetch layer (HTTP + OAuth) hands the engine raw
  * JSON documents; here they are files on disk. The incremental
  * predicate (`after=watermark`, strava_sdk.py:100) is applied as a
  * filter on `epoch` IMMEDIATELY over the scan, mirroring the
  * reference's pushdown of the time predicate into the request — with
  * parquet/JSON sources Catalyst pushes it into the reader, and a
  * DataSource V2 REST table would translate it to a query parameter.
  */
object StravaJsonSource {

  /** S4: incremental activity scan — raw activity JSON (one document
    * per line) cleaned and filtered to epoch > afterEpoch. */
  def activities(spark: SparkSession, path: String, nowEpoch: Double,
                 afterEpoch: Long = 0L): DataFrame = {
    val raw = spark.read.text(path).select(col("value").as("json"))
    CleanActivities.clean(raw, nowEpoch).filter(col("epoch") > afterEpoch)
  }

  /** S5: point lookup by activity id. */
  def activity(spark: SparkSession, path: String, nowEpoch: Double,
               activityId: Long): DataFrame = {
    val raw = spark.read.text(path).select(col("value").as("json"))
    CleanActivities.clean(raw, nowEpoch).filter(col("activity_id") === activityId)
  }

  /** S6: multi-channel stream fetch -> long form. Input: one JSON doc
    * per line shaped {"activity_id": .., "time": [...], "latlng":
    * [[lat,lng],...], "heartrate": [...], ...} (the channel-dict the
    * reference pivots at main.py:50). Missing channels null-pad to the
    * common length (strava_sdk.py:154-156) — here: arrays_zip aligns on
    * index and absent channels are null columns. */
  def streams(spark: SparkSession, path: String): DataFrame =
    pivotStreams(spark.read.schema(StravaSchemas.streamDictSchema).json(path))

  /** The S6 pivot itself, on an already-parsed channel-dict frame
    * (one row per activity: `activity_id`, `time` array, one array per
    * present channel — absent channels as null arrays). Exposed so the
    * pivot/padding semantics are gateable without file IO. */
  def pivotStreams(parsed: DataFrame): DataFrame = {
    val channelArrays = StravaSchemas.streamSample.fields
      .filterNot(f => f.name == "activity_id" || f.name == "time")
      .map(_.name)
    // R1 pivot: parallel channel arrays -> one row per sample.
    val zipped = parsed.select(col("activity_id"),
      posexplode(col("time")).as(Seq("idx", "time")),
      struct(channelArrays.toIndexedSeq.map(col): _*).as("ch"))
    zipped.select(
      Seq(col("activity_id"), col("time")) ++
        channelArrays.map(n => element_at(col(s"ch.$n"), col("idx") + 1).as(n)): _*)
  }
}
