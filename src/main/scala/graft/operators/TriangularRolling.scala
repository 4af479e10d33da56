package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._

/** Trailing triangular-weighted rolling mean, the one genuinely custom
  * aggregate in the reference (main.py:89,
  * `df.rolling(i, win_type='triang').mean()` for
  * i in {1,5,10,20,30,45,60,120,300,600,1200}). Pinned pandas semantics:
  *
  *  - trailing window of exactly `n` rows;
  *  - symmetric triangular weights (scipy.signal.windows.triang);
  *  - null until `n` rows exist (min_periods defaults to the window);
  *  - a null anywhere inside a full window poisons the result (weighted
  *    kernels do not skip NaNs).
  *
  * Strategy: collect the frame into an array — nulls encoded as NaN so
  * they survive `collect_list` (which drops nulls) AND poison the dot
  * product, exactly the pandas behaviour — then fold a weighted dot
  * product with codegen'd higher-order functions (`zip_with` +
  * `aggregate`). No UDFs, no custom nodes; everything stays inside
  * whole-stage codegen except the Window exchange itself.
  *
  * Scale: O(n) state per row with n <= 1200 in the reference; windows
  * are per-activity/per-user partitions, so executor memory stays
  * bounded and the only shuffle is the Window partitioning (shared by
  * all 33 rolling columns — Catalyst evaluates every frame over one
  * sort). If profiling ever shows the O(n) fold dominating, the scale
  * path is a custom DeclarativeAggregate window function (running
  * triangular sums via two cumulative passes); not needed at current
  * benchmark scale.
  */
object TriangularRolling {

  /** Unnormalized scipy.signal.windows.triang weights.
    * odd n:  1, 2, ..., (n+1)/2, ..., 2, 1
    * even n: 1, 3, ..., n-1, n-1, ..., 3, 1
    */
  def weights(n: Int): Seq[Double] = {
    require(n >= 1)
    if (n % 2 == 1) (0 until n).map(k => math.min(k + 1, n - k).toDouble)
    else (0 until n).map(k => 2.0 * math.min(k, n - 1 - k) + 1.0)
  }

  /** Triangular rolling mean of `value` over the trailing `n` rows of
    * window spec `w` (which must carry partitionBy + orderBy).
    */
  def triangMean(value: Column, w: WindowSpec, n: Int): Column = {
    val frame = w.rowsBetween(-(n - 1), 0)
    val arr = collect_list(coalesce(value.cast("double"), lit(Double.NaN))).over(frame)
    val wts = array(weights(n).map(lit): _*)
    val dot = aggregate(zip_with(arr, wts, (x, wt) => x * wt), lit(0.0), (acc, x) => acc + x)
    val mean = dot / lit(weights(n).sum)
    when(size(arr) === n && !isnan(mean), mean)
  }
}
