package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
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
    *
    * O(n) per row (collects the frame). Exact reference formulation —
    * use [[triangMeansFast]] for large windows / many windows at once.
    */
  def triangMean(value: Column, w: WindowSpec, n: Int): Column = {
    val frame = w.rowsBetween(-(n - 1), 0)
    val arr = collect_list(coalesce(value.cast("double"), lit(Double.NaN))).over(frame)
    val wts = array(weights(n).map(lit): _*)
    val dot = aggregate(zip_with(arr, wts, (x, wt) => x * wt), lit(0.0), (acc, x) => acc + x)
    val mean = dot / lit(weights(n).sum)
    when(size(arr) === n && !isnan(mean), mean)
  }

  /** The round-11 kernel — O(1)/row AND exact-class: the trailing
    * triangular mean as a custom window aggregate
    * ([[graft.functions.TriangRollingKahan]]) over the RUNNING frame,
    * whose state is a ring buffer of the last `n` values with
    * Neumaier-compensated sliding sums. Same pinned pandas semantics
    * as [[triangMean]] (null until `n` rows; NaN/null poisons while
    * inside the window), bit-EQUAL to it on integer-valued inputs
    * (every update exact below 2^53 — the a5 gate discipline) and
    * ulp-class on floats with NO dependence on partition length
    * (unlike the prefix-sum kernel's difference-of-cumsum
    * cancellation, every running quantity here is window-local).
    * All (channel, window) columns over the same `w` share ONE
    * partition sort/exchange, like every other frame. */
  def triangMeanKahan(value: Column, w: WindowSpec, n: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.functions.TriangRollingKahan(
        Bridge.expression(value.cast("double")), n).toAggregateExpression())
      .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
  }

  /** [[triangMeanKahan]] for every (channel, window) pair — the
    * drop-in signature twin of [[triangMeansFast]], sharing one
    * partition sort across all output columns. */
  def triangMeansKahan(df: DataFrame, partitionCols: Seq[String],
                       orderCols: Seq[String], channels: Seq[String],
                       ns: Seq[Int], outPrefix: String = "tri"): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val outCols = for { ch <- channels; n <- ns }
      yield triangMeanKahan(col(ch), w, n).as(s"${outPrefix}_${ch}_$n")
    df.select(df.columns.map(col).toSeq ++ outCols: _*)
  }

  /** O(1)-per-row triangular rolling means via prefix-sum decomposition
    * — the 100 TB path for the reference's windows up to 1200 rows.
    *
    * A triangular weight is piecewise-linear in the row number, so the
    * weighted window sum decomposes into differences of two RUNNING
    * sums, C = cumsum(x) and D = cumsum(x * rn), evaluated at three
    * frame boundaries (current row, ramp apex, window start) obtained
    * with `lag`. Running frames are computed incrementally by Spark's
    * window operator (O(1) amortized per row), unlike sliding frames
    * which rescan the frame — so cost is independent of the window
    * size, and ALL windows/channels share one partition sort.
    *
    * Numerics: differences of prefix sums can lose a few ulps to
    * cancellation on very long partitions (|D| ~ x*rn^2/2); this is an
    * analytics kernel, not the bit-parity oracle path ([[triangMean]]
    * remains that).
    *
    * Returns `df` plus a column `s"${outPrefix}_${ch}_${n}"` for every
    * (channel, window) pair, with pandas min_periods + null-poisoning
    * semantics identical to [[triangMean]].
    */
  def triangMeansFast(df: DataFrame, partitionCols: Seq[String],
                      orderCols: Seq[String], channels: Seq[String],
                      ns: Seq[Int], outPrefix: String = "tri"): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // pass 1: row number + per-channel running sums
    val rn = row_number().over(w).cast("double")
    val pass1Cols = channels.flatMap { ch =>
      val x = col(ch).cast("double")
      Seq(
        sum(coalesce(x, lit(0.0))).over(run).as(s"__c_$ch"),
        sum(coalesce(x, lit(0.0)) * rn).over(run).as(s"__d_$ch"),
        sum(when(x.isNull, 1L).otherwise(0L)).over(run).as(s"__nc_$ch"))
    }
    val staged = df.select(df.columns.map(col).toSeq ++ Seq(rn.as("__rn")) ++ pass1Cols: _*)

    // pass 2: per (channel, window) O(1) combination of lagged prefixes
    val outCols = for {
      ch <- channels
      n <- ns
    } yield {
      val m = (n + 1) / 2 // ramp length (odd: peak at m; even: m rising rows)
      val c = col(s"__c_$ch"); val d = col(s"__d_$ch"); val nc = col(s"__nc_$ch")
      def lag0(e: Column, j: Int) = coalesce(lag(e, j).over(w), lit(0.0))
      def lagL(e: Column, j: Int) = coalesce(lag(e, j).over(w), lit(0L))
      val rnT = col("__rn")
      val sRn = rnT - n + 1 // window-start row number
      // rising rows [s, s+m-1], falling rows [s+m, t]
      val s0r = lag0(c, n - m) - lag0(c, n)
      val s1r = lag0(d, n - m) - lag0(d, n)
      val s0f = c - lag0(c, n - m)
      val s1f = d - lag0(d, n - m)
      val wsum = if (n % 2 == 1) {
        // w(i) = (rn_i - s + 1) rising; (rn_t + 1 - rn_i) falling
        (s1r + (lit(1) - sRn) * s0r) + (lit(-1) * s1f + (rnT + lit(1)) * s0f)
      } else {
        // w(i) = 2(rn_i - s) + 1 rising; 2n - 1 - 2(rn_i - s) falling
        (lit(2) * s1r + (lit(1) - lit(2) * sRn) * s0r) +
          (lit(-2) * s1f + (lit(2 * n - 1) + lit(2) * sRn) * s0f)
      }
      val nulls = nc - lagL(nc, n)
      val mean = wsum / lit(weights(n).sum)
      when(col("__rn") >= n && nulls === 0, mean).as(s"${outPrefix}_${ch}_$n")
    }
    staged.select(df.columns.map(col).toSeq ++ Seq(col("__rn")) ++ outCols: _*)
      .drop("__rn")
  }
}
