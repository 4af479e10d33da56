package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: a new session starts when the time since
  * the previous event (same keys) EXCEEDS `gapSeconds`. The batch
  * analogue of `session_window`, boundary included: Spark merges
  * sessions whose windows TOUCH, so an event exactly `gap` after the
  * previous one CONTINUES the session — verified empirically against
  * `session_window` by the SessionizeSpec equivalence property (the
  * previous `>=` spelling diverged from the built-in at exactly-gap
  * spacing; the w1/w4/w6 oracles carry the same strict inequality).
  *
  * One shuffle on the keys; session ids are a running sum of
  * "new session" flags over the sorted partition — linear, no state
  * beyond the sort, skew profile identical to any per-key window.
  */
object Sessionize {

  /** Adds a per-key `session_id` column (1-based, ordered by `tsCol`). */
  def withSessionId(df: DataFrame, keys: Seq[String], tsCol: String,
                    gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol))
    val prev = lag(col(tsCol), 1).over(w)
    val isNew = when(
      prev.isNull ||
        unix_millis(col(tsCol)) - unix_millis(prev) > gapSeconds * 1000L,
      1L).otherwise(0L)
    df.withColumn("__is_new", isNew)
      .withColumn("session_id",
        sum(col("__is_new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__is_new")
  }

  /** Sessionization with BOTH a gap cap and a maximum session
    * DURATION: a new session starts when the gap since the previous
    * event exceeds `gapSeconds` (strict, as [[withSessionId]]) OR when
    * this event would stretch the current session past
    * `maxDurationSeconds` from its first event. The duration-capped
    * variant is what billing/attribution pipelines actually run — and
    * it is NOT expressible as window functions: each session's start
    * depends on where the previous split landed, a sequential
    * recurrence (the declarative running-sum trick only handles the
    * gap predicate, whose trigger is a per-row lag).
    *
    * Implementation is the secondary-sort pattern: one hash exchange
    * on the keys, an in-partition sort by (keys, ts, tie), then a
    * single-pass `mapPartitions` fold carrying O(1) state (current
    * key, previous ts, session start) — no per-group
    * materialization, no driver state, arbitrarily hot keys stream
    * through one task in sorted order exactly like any per-key
    * window would. Timestamp arithmetic runs at full MICROsecond
    * precision (epoch micros, not Timestamp.getTime millis — the
    * truncation class of bug).
    *
    * `session_id` is 1-based per key; `tieCols` must make the sort
    * total or splits at identical timestamps are nondeterministic.
    */
  def withCappedSessionId(df: DataFrame, keys: Seq[String], tsCol: String,
                          tieCols: Seq[String], gapSeconds: Long,
                          maxDurationSeconds: Long): DataFrame = {
    require(gapSeconds > 0 && maxDurationSeconds > 0)
    val gapUs = gapSeconds * 1000000L
    val capUs = maxDurationSeconds * 1000000L
    val schema = df.schema
    val outSchema = schema.add("session_id", org.apache.spark.sql.types.LongType)
    val keyIdx = keys.map(schema.fieldIndex)
    val tsIdx = schema.fieldIndex(tsCol)
    val sorted = df
      .repartition(keys.map(col): _*)
      .sortWithinPartitions((keys ++ Seq(tsCol) ++ tieCols).map(col): _*)
    sorted.mapPartitions { it =>
      var curKey: Seq[Any] = null
      var sid = 0L
      var startUs = 0L
      var prevUs = 0L
      it.map { r =>
        val k = keyIdx.map(r.get)
        val inst = r.getAs[java.sql.Timestamp](tsIdx).toInstant
        val us = inst.getEpochSecond * 1000000L + inst.getNano / 1000L
        if (curKey == null || k != curKey) {
          curKey = k; sid = 1L; startUs = us
        } else if (us - prevUs > gapUs || us - startUs > capUs) {
          sid += 1L; startUs = us
        }
        prevUs = us
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ sid)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }
}
