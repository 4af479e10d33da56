package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval-union coverage — the classic sweep-line "merge overlapping
  * intervals" aggregate (total covered time, merged-block count) done
  * as ONE ordered window pass, never an interval self-join.
  *
  * The standard sequential algorithm sorts intervals by start and
  * carries the running maximum end; an interval's NEW contribution is
  * `max(0, end - max(start, carriedEnd))` and it opens a new merged
  * block iff it starts strictly after everything covered so far. Both
  * carried quantities are expressible as a running `max(end)` window
  * over the preceding rows, so the whole sweep is declarative: Spark
  * plans one shuffle on the grouping key + one in-partition sort, and
  * whole-stage codegen fuses the two derived columns into the window
  * pass. The per-row contributions are order-independent under ties
  * (two identical intervals: whichever sorts second contributes 0),
  * so the aggregated outputs are deterministic even though the sort
  * is not total.
  *
  * This is the session-time / uptime / SLA-coverage primitive next to
  * [[Sessionize]] (which CUTS on gaps; this MEASURES the union), and
  * the dwell-time aggregate behind engagement metrics ("minutes
  * active" from possibly-overlapping activity windows).
  *
  * Scale: one exchange on `keyCols`, state per row is one int64 (the
  * running max) — no explode, no self-join, no driver state. Skewed
  * single keys (one user with 10^9 intervals) fall back to the
  * two-phase form: coarse time-bucket pre-union within (key, bucket),
  * then this same sweep over the per-bucket remainders — the merge
  * algebra is associative because a bucket's interior coverage never
  * depends on other buckets once intervals are clipped to bucket
  * bounds. Half-open `[start, end)` semantics; touching intervals
  * (`prevEnd == start`) merge into one block and double-count
  * nothing.
  */
object Intervals {

  /** Per-key union coverage of half-open `[startCol, endCol)` int64
    * intervals: (keyCols*, n_intervals, n_blocks, covered) where
    * `covered` is the exact length of the union and `n_blocks` the
    * number of maximal merged runs. Zero- or negative-length
    * intervals contribute no coverage but still count in
    * `n_intervals` (and can still bridge NOTHING — they never extend
    * the carried end beyond real coverage because `max(end)` over a
    * degenerate interval is dominated by any real one; a standalone
    * degenerate interval opens a block of length 0). */
  def unionCoverage(df: DataFrame, keyCols: Seq[String], startCol: String,
                    endCol: String): DataFrame = {
    require(keyCols.nonEmpty, "unionCoverage needs at least one key column")
    val keys: Seq[Column] = keyCols.map(col)
    val w = Window.partitionBy(keys: _*)
      .orderBy(col(startCol), col(endCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prev = max(col(endCol)).over(w)
    df.withColumn("__prev_end", prev)
      .withColumn("__gain",
        greatest(lit(0L), col(endCol) -
          greatest(col(startCol), coalesce(col("__prev_end"), col(startCol)))))
      .withColumn("__opens",
        when(col("__prev_end").isNull ||
          col("__prev_end") < col(startCol), 1L).otherwise(0L))
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("__opens")).as("n_blocks"),
        sum(col("__gain")).as("covered"))
  }
}
