package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Structured Streaming surface — the streaming twin of the batch
  * watermark-pull incrementality in the reference (S3+S4: poll
  * `after=max(epoch)`; here: `withWatermark` + windowed state).
  *
  * These transforms are sink-agnostic: bind them with
  * `spark.readStream...` and any `writeStream` sink. Tests drive them
  * with a file source + memory sink via `processAllAvailable()`.
  */
object EventStream {

  /** Watermarked tumbling hourly aggregate (streaming w2_tumbling).
    * Late events beyond 2h are dropped deterministically by the
    * watermark instead of silently corrupting closed windows. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"))

  /** Gap-based session aggregation via session_window (streaming
    * w1_sessionize; same gap semantics as operators.Sessionize). */
  def sessionCounts(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"), col("n_events"))

  case class UserEvent(user_id: Long, value: Double)
  case class UserTotals(user_id: Long, n_events: Long, value_sum: Double)

  /** Custom keyed state via mapGroupsWithState: per-user running totals
    * that survive across micro-batches — the seam for arbitrary state
    * the built-in windows can't express (the reference's per-user
    * token/watermark bookkeeping lives here in streaming mode). */
  def runningUserTotals(events: Dataset[UserEvent]): Dataset[UserTotals] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserTotals, UserTotals](GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[UserEvent], state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(userId, 0L, 0.0))
          var n = prev.n_events
          var s = prev.value_sum
          batch.foreach { e => n += 1; s += e.value }
          val updated = UserTotals(userId, n, s)
          state.update(updated)
          updated
      }
  }
}
