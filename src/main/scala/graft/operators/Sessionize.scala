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
}
