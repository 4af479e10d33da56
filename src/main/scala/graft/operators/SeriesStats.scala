package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Series-level statistics over an ALREADY-AGGREGATED time series
  * (daily counts, hourly totals): the input is time-domain-sized
  * (thousands of rows for years of days), never corpus-sized, which
  * is what licenses the single-partition ordered window here — the
  * same boundedness argument as [[Skyline]]'s global pass and the
  * driver-side d×d eigen work in [[Pca]]. The corpus-sized work
  * (building the series) is an ordinary groupBy aggregation upstream.
  */
object SeriesStats {

  /** Lag-k autocorrelation (the ACF at chosen lags — the
    * seasonality/momentum detector behind "is this metric weekly
    * periodic", complementing [[Ewma]]'s forecasts and
    * [[Behavior]]'s CUSUM drift): for the series x_1..x_n,
    * `r_k = sum((x_t - m)(x_{t+k} - m)) / sum((x_t - m)^2)`.
    *
    * Computed in EXACT integer arithmetic: with `c_t = n*x_t - S`
    * (the mean-centered value scaled by n, an exact int64),
    * `r_k = sum(c_t * c_{t+k}) * 1e6 div sum(c_t^2)` — numerator
    * and denominator are published alongside the ppm ratio, and the
    * only division is the final truncating one, identical in any
    * engine (both Spark `div` and the oracle's `//` truncate toward
    * zero, so negative autocorrelations agree too). NULL r_ppm when
    * the series is constant (den = 0: undefined, not 0).
    *
    * Exact-int64 envelope: `den * 1e6 < 2^63` means
    * `sum(c^2) < 9.2e12` — comfortably true for count series up to
    * ~thousands of points with per-point counts into the tens of
    * thousands (|num_k| <= den by Cauchy-Schwarz, so the numerator
    * never needs a wider bound). Past it, pre-scale the series by a
    * power of two; the ratio is scale-invariant up to the floor.
    *
    * Output: one row per lag — (lag, n, num, den, r_ppm). Gaps in
    * the series are NOT filled: lags are over the observed, ordered
    * points; spine-fill upstream (r3's discipline) when calendar
    * lags must skip missing days. */
  def autocorr(series: DataFrame, orderCol: String, valueCol: String,
               lags: Seq[Int]): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ >= 1),
      "lags must be >= 1 and non-empty")
    val stats = series.agg(count(lit(1)).as("__n"),
      sum(col(valueCol)).as("__s"))
    val c = series.crossJoin(broadcast(stats))
      .select(col(orderCol), col("__n"),
        (col("__n") * col(valueCol) - col("__s")).as("__c"))
    val w = Window.orderBy(orderCol)
    val withLags = lags.foldLeft(c) { (df, k) =>
      df.withColumn(s"__c$k", lag(col("__c"), k).over(w))
    }
    val aggs =
      max(col("__n")).as("n") +:
        sum(col("__c") * col("__c")).as("den") +:
        lags.map(k => sum(col("__c") * col(s"__c$k")).as(s"__num$k"))
    val a = withLags.agg(aggs.head, aggs.tail: _*)
    val stacked = lags.map(k => s"${k}L, __num$k").mkString(", ")
    a.select(expr(s"stack(${lags.size}, $stacked) AS (lag, num)"),
        col("n"), col("den"))
      .select(col("lag"), col("n"), coalesce(col("num"), lit(0L)).as("num"),
        col("den"),
        expr("""CASE WHEN den = 0 THEN CAST(NULL AS BIGINT)
                ELSE coalesce(num, 0L) * 1000000 div den END""").as("r_ppm"))
  }
}
