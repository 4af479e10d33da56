package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Ingest-side normalization for `events`-shaped feeds — the fix for
  * the nanos-timestamp pushdown gap (SCALE.md "Known limits"): the
  * driver's raw events parquet carries `TIMESTAMP(NANOS)`, which Spark
  * reads via the nanos-as-long conversion; every time predicate then
  * sits above a projection (`timestamp_micros(ts div 1000)`) and never
  * reaches the parquet scan, so row-group pruning cannot apply — at
  * real scale every w/g-family query re-reads the full history.
  *
  * The ingest job pays the conversion ONCE: it rewrites the feed with
  *  - `ts` as native `TIMESTAMP` (micros) — parquet min/max stats now
  *    match the query type, so `ts >= X` pushes into the scan and
  *    prunes row groups, and
  *  - an `event_date` partition column — date predicates prune whole
  *    directories before any file is opened (partition pruning, the
  *    coarser and cheaper tier).
  *
  * [[EventsIngestSpec]] pins both claims on the executed plan
  * (PushedFilters contains the ts bound; the scan's partition count
  * drops under a date predicate). The same two-tier layout is what
  * [[ActivitySink]] does for the reference's activity feed — this is
  * the generic events-shaped twin.
  */
object EventsIngest {

  /** One-time normalize: raw events dir -> `outDir` partitioned by
    * `event_date`, `ts` as micros TIMESTAMP. Idempotent (overwrite). */
  def normalize(spark: SparkSession, rawDir: String, outDir: String): Unit =
    Tables.load(spark, rawDir, "events")
      .withColumn("event_date", to_date(col("ts")))
      .write.mode("overwrite")
      .partitionBy("event_date")
      .parquet(outDir)

  /** Scan of the normalized layout. Time predicates on `ts` push to
    * parquet row groups; predicates on `event_date` prune partitions. */
  def scan(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir)
}
