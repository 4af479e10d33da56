package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2D Pareto frontier (skyline, Borzsony/Kossmann/Stocker ICDE'01) —
  * the multi-objective selection primitive ("largest AND freshest",
  * "highest quality AND longest") that replaces ad-hoc weighted
  * scores when the trade-off curve itself is the answer.
  *
  * The 2D case never needs the general block-nested-loop: on DISTINCT
  * points sorted by `(x DESC, y DESC)`, a point is dominated exactly
  * when the running max of `y` over the PRECEDING rows reaches its own
  * `y` — every preceding row has `x' > x`, or `x' = x` with `y' > y`,
  * so a preceding `y' >= y` is a strict dominator, and no other row
  * can dominate. One sort, one running max, zero self-joins.
  *
  * Plan shape (three stages, each a textbook Spark primitive):
  *  1. collapse rows to distinct `(x, y)` points with counts — a
  *     map-side-combined aggregation that shrinks 10^12 rows to the
  *     value-domain size before anything else runs;
  *  2. bucket-local prune: the sweep above inside each of `buckets`
  *     hash buckets. Sound because domination within ANY subset
  *     implies global domination — survivors of every bucket are a
  *     superset of the true frontier. Expected survivors per bucket
  *     for random orderings is O(log n) (the classic record-count
  *     bound), so the candidate set is ~`buckets * log n`;
  *  3. global sweep over the candidates in one partition — bounded by
  *     stage 2, the same way [[GlobalRank]] bounds its final merge.
  *     At larger scale raise `buckets` or repeat stage 2; the prune
  *     is idempotent and monotone.
  *
  * Exact int64 comparisons throughout; ties on both coordinates are
  * ONE frontier point with `n_rows` aggregated (equal points never
  * dominate each other).
  */
object Skyline {

  /** Frontier points maximizing both `xCol` and `yCol` (int64):
    * (xCol, yCol, n_rows), every point not dominated by another with
    * `x' >= x, y' >= y` and one strict. */
  def frontier2d(df: DataFrame, xCol: String, yCol: String,
                 buckets: Int = 32): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    val x = col(xCol)
    val y = col(yCol)
    val pts = df.groupBy(x, y).agg(count(lit(1)).as("n_rows"))
    val local = Window.partitionBy(col("__b"))
      .orderBy(x.desc, y.desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val candidates = pts
      .withColumn("__b", pmod(xxhash64(x, y), lit(buckets)))
      .withColumn("__m", max(y).over(local))
      .filter(col("__m").isNull || col("__m") < y)
      .drop("__b", "__m")
    val global = Window.orderBy(x.desc, y.desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    candidates
      .withColumn("__m", max(y).over(global))
      .filter(col("__m").isNull || col("__m") < y)
      .drop("__m")
  }
}
