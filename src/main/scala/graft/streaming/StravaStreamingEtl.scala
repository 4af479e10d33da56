package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.etl.{ActivityPipeline, ActivitySink, CleanActivities}
import graft.sources.StravaJsonSource

/** Streaming E1: the reference's poll loop (main.py:199-205) as a
  * Structured Streaming file-source query. New activity documents
  * landing in the feed directory flow through the SAME batch pipeline
  * (clean -> spine -> interpolate -> rolling -> nest) via foreachBatch
  * and append to the date-partitioned sink; the file-source +
  * checkpoint replace the hand-rolled `after=watermark` poll with
  * exactly-once source tracking.
  */
object StravaStreamingEtl {

  def start(spark: SparkSession, activitiesDir: String, streamsPath: String,
            sinkPath: String, checkpointDir: String, nowEpoch: Long,
            legacyCompat: Boolean = false): StreamingQuery = {
    val raw = spark.readStream
      .schema(StructType(Seq(StructField("value", StringType))))
      .text(activitiesDir)
      .select(col("value").as("json"))

    raw.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val acts = CleanActivities.clean(batch, nowEpoch.toDouble)
          .filter(col("_valid")).drop("_valid")
        if (!acts.isEmpty) {
          val streams = StravaJsonSource.streams(spark, streamsPath)
            .join(acts.select("activity_id"), Seq("activity_id"))
          val rows = ActivityPipeline.process(acts, streams, nowEpoch, legacyCompat)
          ActivitySink.append(rows, sinkPath)
        }
        ()
      }
      .start()
  }
}
