package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

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
      sum(col(valueCol)).as("__s"),
      count(col(orderCol)).as("__nn"),
      count_distinct(col(orderCol)).as("__nd"))
    // The ordered lag() window has the changepoint family's failure
    // class: a duplicate (or NULL) order value makes every lagged pair
    // tie-order-dependent — nondeterministic run to run and divergent
    // from the oracle's deterministic ORDER BY. Same executable guard,
    // riding inside the consumed centered value so it cannot be pruned.
    val c = series.crossJoin(broadcast(stats))
      .select(col(orderCol), col("__n"),
        (col("__n") * col(valueCol) - col("__s") +
          orderContractGuard("autocorr")).as("__c"))
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

  /** Dominant-period detector: the lag with the strongest
    * autocorrelation in [minLag, maxLag] — "IS this metric weekly or
    * daily periodic, and which", the question [[autocorr]] at chosen
    * lags assumes the caller already answered. Start minLag at 2 for
    * periodicity hunting: lag-1 measures momentum/trend, and any
    * trending series maximizes it without being periodic.
    *
    * Exactness: the candidate r_ppm values are [[autocorr]]'s exact
    * int64 ratios, so the argmax (ties -> smallest lag; NULL r_ppm
    * i.e. constant series excluded — no period is definable) is
    * engine-identical. One row: (period, n, num, den, r_ppm); empty
    * when every candidate is NULL. The rank window sees at most
    * maxLag-minLag+1 rows. */
  def dominantPeriod(series: DataFrame, orderCol: String,
                     valueCol: String, minLag: Int,
                     maxLag: Int): DataFrame = {
    require(minLag >= 1 && maxLag >= minLag,
      s"need 1 <= minLag <= maxLag (got $minLag..$maxLag)")
    val ac = autocorr(series, orderCol, valueCol, minLag to maxLag)
    val pick = Window.orderBy(col("r_ppm").desc, col("lag").asc)
    // lag < n: a lag at or past the series length has ZERO overlapping
    // pairs — autocorr reports it as num=0 (r_ppm=0), which would
    // otherwise beat every genuinely-negative real lag and report a
    // "period" no observation supports (round-10 review finding)
    ac.filter(col("r_ppm").isNotNull && col("lag") < col("n"))
      .withColumn("__r", row_number().over(pick))
      .filter(col("__r") === 1)
      .select(col("lag").as("period"), col("n"), col("num"), col("den"),
        col("r_ppm"))
  }

  /** Grouped [[autocorr]]: the exact-int64 ACF per key — every lag
    * window PARTITIONED by the key (no global ordered window; the
    * family's standing shape upgrade), stats attached by a plain
    * equi-join (AQE broadcasts when the key domain fits —
    * [[changepointByKey]]'s rule). Same order-column contract,
    * per key. Output: one row per (key, lag). */
  def autocorrByKey(series: DataFrame, keyCol: String, orderCol: String,
                    valueCol: String, lags: Seq[Int]): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ >= 1),
      "lags must be >= 1 and non-empty")
    val stats = series.groupBy(col(keyCol)).agg(count(lit(1)).as("__n"),
      sum(col(valueCol)).as("__s"),
      count(col(orderCol)).as("__nn"),
      count_distinct(col(orderCol)).as("__nd"))
    val c = series.join(stats, Seq(keyCol))
      .select(col(keyCol), col(orderCol), col("__n"),
        (col("__n") * col(valueCol) - col("__s") +
          orderContractGuard("autocorrByKey")).as("__c"))
    val w = Window.partitionBy(keyCol).orderBy(orderCol)
    val withLags = lags.foldLeft(c) { (df, k) =>
      df.withColumn(s"__c$k", lag(col("__c"), k).over(w))
    }
    val aggs =
      max(col("__n")).as("n") +:
        sum(col("__c") * col("__c")).as("den") +:
        lags.map(k => sum(col("__c") * col(s"__c$k")).as(s"__num$k"))
    val a = withLags.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
    val stacked = lags.map(k => s"${k}L, __num$k").mkString(", ")
    a.select(col(keyCol),
        expr(s"stack(${lags.size}, $stacked) AS (lag, num)"),
        col("n"), col("den"))
      .select(col(keyCol), col("lag"), col("n"),
        coalesce(col("num"), lit(0L)).as("num"), col("den"),
        expr("""CASE WHEN den = 0 THEN CAST(NULL AS BIGINT)
                ELSE coalesce(num, 0L) * 1000000 div den END""").as("r_ppm"))
  }

  /** Grouped [[dominantPeriod]]: the strongest-ACF lag per key —
    * "WHICH metrics are periodic, and at what period", the fleet form
    * (a14/a16/a19's shape, applied to a17). The per-key rank window
    * sees at most maxLag−minLag+1 rows; constant keys (every
    * candidate NULL) are absent. */
  def dominantPeriodByKey(series: DataFrame, keyCol: String,
                          orderCol: String, valueCol: String,
                          minLag: Int, maxLag: Int): DataFrame = {
    require(minLag >= 1 && maxLag >= minLag,
      s"need 1 <= minLag <= maxLag (got $minLag..$maxLag)")
    val ac = autocorrByKey(series, keyCol, orderCol, valueCol,
      minLag to maxLag)
    val pick = Window.partitionBy(keyCol)
      .orderBy(col("r_ppm").desc, col("lag").asc)
    ac.filter(col("r_ppm").isNotNull && col("lag") < col("n"))
      .withColumn("__r", row_number().over(pick))
      .filter(col("__r") === 1)
      .select(col(keyCol), col("lag").as("period"), col("n"), col("num"),
        col("den"), col("r_ppm"))
  }

  /** Classical additive seasonal decomposition, reduced to the part a
    * pipeline dashboard actually stores: the per-slot SEASONAL INDEX
    * (how far a Monday / an hour-17 / a q4-week sits above or below
    * local trend), with trend estimated by the textbook centered
    * moving average of one full period (Kendall & Stuart's classical
    * decomposition; the same detrend STL refines). Complements
    * [[autocorr]] ("is it periodic?") with "WHAT is the periodic
    * shape", and [[Ewma.holtWinters]] (model-based, online) with the
    * model-free diagnostic both engines can replay exactly.
    *
    * EXACT integer arithmetic throughout: with v_t int64 (counts,
    * cents), the period-scaled detrended value
    * `d_t = period*v_t - sum(v_{t-h} .. v_{t+h})`  (h = (period-1)/2)
    * is an exact int64 (the mean is never formed); rows without a
    * full centered window are excluded (classical decomposition's
    * edge rule — min_periods = period, like A3's rolling). Per slot:
    * `num = sum(d_t)`, `idx = num div (period * n_obs)` — value
    * units, single truncating division, negative-safe (Spark `div`
    * and DuckDB `//` both truncate toward zero, verified for this
    * repo's engines). num/n_obs are published so a caller needing
    * more precision re-divides at any scale.
    *
    * The window is ROW-centered over the ordered series: calendar
    * gaps are the caller's concern (spine-fill upstream, r3's
    * discipline, when missing days must count as zero).
    *
    * Scale shape: the input is an ALREADY-AGGREGATED time series
    * (this object's standing boundedness argument), so the one
    * ordered window runs over a time-domain-sized table; the output
    * is slot-sized (7 rows for day-of-week, 24 for hour-of-day). The
    * corpus-sized work is the upstream groupBy that built the series.
    *
    * `slotCol` maps each point to its seasonal slot (day-of-week,
    * hour, week-of-quarter); `period` must be odd so the centered
    * window is symmetric (classical decomposition uses a 2x(2h)
    * double average for even periods — out of scope here, use an odd
    * period or pre-smooth). */
  def seasonalIndex(series: DataFrame, orderCol: String, valueCol: String,
                    slotCol: String, period: Int): DataFrame =
    detrended(series, orderCol, valueCol, period)
      .groupBy(col(slotCol).as("slot"))
      .agg(count(lit(1)).as("n_obs"), sum(col("__d")).as("num"))
      .withColumn("idx", expr(s"num div ($period * n_obs)"))

  /** Grouped [[seasonalIndex]]: the per-slot seasonal index PER KEY —
    * "what is each source's weekly shape", the fleet form (a14/a16/
    * a19/a20/a21's shape applied to the decomposition family). Every
    * centered window is PARTITIONED by the key (no global ordered
    * window anywhere), so the detrend is embarrassingly parallel
    * across keys; the output is keys × slots. Same exact-integer
    * arithmetic and full-window edge rule as the one-series form,
    * per key. */
  def seasonalIndexByKey(series: DataFrame, keyCol: String,
                         orderCol: String, valueCol: String,
                         slotCol: String, period: Int): DataFrame =
    detrended(series, orderCol, valueCol, period, Seq(keyCol))
      .groupBy(col(keyCol), col(slotCol).as("slot"))
      .agg(count(lit(1)).as("n_obs"), sum(col("__d")).as("num"))
      .withColumn("idx", expr(s"num div ($period * n_obs)"))

  /** The rows-with-a-full-centered-window of `series`, each carrying
    * the period-scaled detrended value
    * `__d = period*v_t - sum(v_{t-h}..v_{t+h})` (exact int64 when the
    * values are). Shared kernel of [[seasonalIndex]] and
    * [[seasonalResiduals]]. */
  private def detrended(series: DataFrame, orderCol: String,
                        valueCol: String, period: Int,
                        keyCols: Seq[String] = Nil): DataFrame = {
    require(period >= 3 && period % 2 == 1,
      s"period must be odd and >= 3 (got $period)")
    val h = (period - 1) / 2
    val base =
      if (keyCols.isEmpty) Window.orderBy(orderCol)
      else Window.partitionBy(keyCols.map(col): _*).orderBy(orderCol)
    val w = base.rowsBetween(-h, h)
    series
      .withColumn("__cnt", count(col(valueCol)).over(w))
      .withColumn("__d",
        lit(period.toLong) * col(valueCol) - sum(col(valueCol)).over(w))
      .filter(col("__cnt") === period)
      .drop("__cnt")
  }

  /** [[seasonalIndex]]'s INCREMENTAL form — the incremental-family
    * contract (d15/d18/d21/g18/e11): maintain the per-slot
    * (n_obs, num) state batch by batch, never rescan the processed
    * series. Works because append-only time means a row's centered
    * window is FINAL once `h` newer rows exist: a new batch finalizes
    * exactly the rows from `old_end - h + 1` through `new_end - h`,
    * whose windows need only the carry plus the batch.
    *
    * Caller persists two tiny artifacts between batches (the
    * manifest discipline of e11): `state` — the (slot, n_obs, num)
    * table so far ([[seasonalIndex]]'s output minus idx), and
    * `carry` — EXACTLY the last `period - 1` rows of the processed
    * series (pass fewer on the first batch; more double-counts).
    * Output = the updated full-history table, bit-equal to
    * [[seasonalIndex]] over the concatenation (the shared-oracle
    * parity the gate pins). */
  def seasonalIndexResume(newRows: DataFrame, carry: DataFrame,
                          state: DataFrame, orderCol: String,
                          valueCol: String, slotCol: String,
                          period: Int): DataFrame = {
    val fresh = detrended(carry.unionByName(newRows), orderCol, valueCol,
        period)
      .groupBy(col(slotCol).as("slot"))
      .agg(count(lit(1)).as("__n2"), sum(col("__d")).as("__num2"))
    state
      .select(col("slot"), col("n_obs").as("__n1"), col("num").as("__num1"))
      .join(fresh, Seq("slot"), "full_outer")
      .select(col("slot"),
        (coalesce(col("__n1"), lit(0L)) + coalesce(col("__n2"), lit(0L)))
          .as("n_obs"),
        (coalesce(col("__num1"), lit(0L)) + coalesce(col("__num2"), lit(0L)))
          .as("num"))
      .withColumn("idx", expr(s"num div ($period * n_obs)"))
  }

  /** Theil-Sen robust trend: the median of all pairwise slopes
    * (y_j - y_i)/(t_j - t_i), i < j — the trend estimator a single
    * outlier day cannot drag (breakdown point ~29%, vs 0% for least
    * squares), the robust complement to [[Ewma.holt]]'s level+trend
    * and [[Behavior]]'s MAD outliers.
    *
    * Engine-exact determinism: each slope is kept as the integer
    * rational (num, den) with den > 0; the median is picked by RANK
    * over (num/den as one IEEE double division, then num, den) — both
    * engines divide the same exact int64s, so the ordering and the
    * picked pair are identical; the published `slope_micros` is one
    * truncating integer division of the picked pair (negative-safe).
    * Lower median at even pair counts (rank (n_pairs+1) div 2).
    *
    * Scale shape: the series is bounded (the object's standing
    * argument), so the O(n²/2) pair set is generated with ONE in-row
    * pair transform over the collected, sorted point array
    * (associationRules' discipline — never a series self-join, no
    * cartesian in any plan) and ranked on the pair domain. A year of
    * days is ~66k pairs. The bound is EXECUTABLE: past `maxPoints`
    * (default [[TheilSenMaxPoints]]) the plan raises instead of
    * exploding — pre-aggregate coarser (weekly) first; the estimator
    * is scale-equivariant. Duplicate order values also raise (they
    * would make den=0 pairs: NULL in Spark, an error in DuckDB).
    * `coarsen=true` is both raises' escape hatch as code
    * ([[coarsenToBound]]): equal-width order-axis buckets, lower
    * medians per bucket — identity on a distinct-order series that
    * already fits the bound. */
  def theilSen(series: DataFrame, orderCol: String,
               valueCol: String,
               maxPoints: Int = TheilSenMaxPoints,
               coarsen: Boolean = false): DataFrame = {
    val in = if (coarsen) coarsenToBound(series, Nil, orderCol, valueCol,
      maxPoints) else series
    val pts = in.agg(
      sort_array(collect_list(struct(col(orderCol).cast("long").as("t"),
        col(valueCol).cast("long").as("y")))).as("pts"))
    val pairs = pts
      .select(theilSenGuardedN(maxPoints).as("n"),
        explode(expr(theilSenPairSql)).as("s"))
    val w = Window.orderBy(
      (col("s.num").cast("double") / col("s.den")).asc,
      col("s.num").asc, col("s.den").asc)
    pairs
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("n_pairs", count(lit(1)).over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .filter(col("__rn") === expr("(n_pairs + 1) div 2"))
      .select(col("n"), col("n_pairs"),
        col("s.num").as("num"), col("s.den").as("den"),
        expr("num * 1000000 div den").as("slope_micros"))
  }

  /** Default in-row pair bound for the Theil-Sen family: 16k points
    * is ~134M pairs, the most one collected row should ever explode.
    * Past it, pre-aggregate the series coarser (weekly) — the
    * estimator is scale-equivariant. */
  val TheilSenMaxPoints: Int = 16384

  /** The Theil-Sen family's documented escape hatch made code (round-10
    * verdict item 7): pre-aggregate `series` to AT MOST `maxPoints`
    * points (per key, when `keyCols` is non-empty) by slicing the
    * order axis into equal-width integer buckets and emitting each
    * bucket's MEDIAN-BY-ORDER ROW AS A UNIT (lower median of the
    * (order, value) structs sorted by order then value) — the exact,
    * engine-replayable form of "aggregate weekly first", keeping the
    * estimator's robustness (a median row is itself outlier-proof in
    * the order dimension, and value outliers are absorbed by the
    * downstream pairwise-slope median). The emitted point is always a
    * ROW THAT EXISTS in the data: taking independent medians of the
    * order and value columns (the round-11 shape) could pair a t and
    * a y that never co-occurred, synthesizing points off the data
    * manifold whenever value order is not aligned with time order
    * (round-11 advice).
    *
    * Width is data-conditional inside the plan, never a branch: when
    * the (per-key) point count already fits the bound the width is 1
    * and a distinct-order series passes through EXACTLY (bucket ==
    * order value, median of one point == the point); past the bound
    * `width = span div maxPoints + 1`, which caps occupied buckets at
    * `span/width + 1 <= maxPoints`. Duplicate order values are merged
    * into their bucket's median rather than raising — `coarsen=true`
    * IS the "aggregate to one point per order value" the guard's
    * message prescribes.
    *
    * Output columns are `orderCol`/`valueCol` as int64 (the pair
    * transform casts to long anyway). Scale shape: one stats
    * aggregate (broadcast back, or an equi-join on the key for the
    * grouped form — fleet-sized key domains must not force a
    * broadcast, changepointByKey's rule) and one groupBy over the
    * bounded series. */
  private def coarsenToBound(series: DataFrame, keyCols: Seq[String],
                             orderCol: String, valueCol: String,
                             maxPoints: Int): DataFrame = {
    val t = col(orderCol).cast("long")
    val joined = if (keyCols.isEmpty) {
      val st = series.agg(min(t).as("__t0"), max(t).as("__t1"),
        count(lit(1)).as("__cnt"))
      series.crossJoin(broadcast(st))
    } else {
      val st = series.groupBy(keyCols.map(col): _*)
        .agg(min(t).as("__t0"), max(t).as("__t1"),
          count(lit(1)).as("__cnt"))
      series.join(st, keyCols)
    }
    joined
      .withColumn("__w",
        when(col("__cnt") <= maxPoints, lit(1L))
          .otherwise(expr(s"(__t1 - __t0) div ${maxPoints}L + 1L")))
      .withColumn("__b", expr(s"(CAST($orderCol AS LONG) - __t0) div __w"))
      .groupBy((keyCols :+ "__b").map(col): _*)
      .agg(sort_array(collect_list(struct(t.as("t"),
        col(valueCol).cast("long").as("y")))).as("__pts"))
      .withColumn("__m",
        expr("element_at(__pts, CAST((size(__pts) + 1) div 2 AS INT))"))
      .select((keyCols.map(col) ++ Seq(
        col("__m.t").as(orderCol), col("__m.y").as(valueCol))): _*)
  }

  /** The O(n²/2) i<j pair set as ONE in-row transform over the
    * collected, sorted point array — never a series self-join. */
  private val theilSenPairSql =
    """flatten(transform(pts, (p, i) ->
         transform(slice(pts, i + 2, size(pts)),
           q -> struct(q.y - p.y AS num, q.t - p.t AS den))))"""

  /** `size(pts)` with the operator's two preconditions made
    * EXECUTABLE: (1) the bounded-series contract (≤ maxPoints — the
    * scaladoc's "pre-aggregate past ~10^4" was prose until round 10;
    * at n=10^6 the pair explode is half a trillion rows) and (2)
    * distinct order values (a repeated t yields den=0 pairs, whose
    * slope ranks as ±Infinity/NaN in Spark but raises in DuckDB —
    * silent engine divergence). `assert_true` is NULL when its
    * predicate holds, so coalescing its cast into the consumed `n`
    * expression keeps the contract in the live plan — a standalone
    * assert column would be pruned by Catalyst as unused. */
  private def theilSenGuardedN(maxPoints: Int) = {
    val n = size(col("pts")).cast("long")
    val sizeOk = assert_true(size(col("pts")) <= lit(maxPoints),
      concat(lit("theilSen: series of "), size(col("pts")).cast("string"),
        lit(s" points exceeds the $maxPoints in-row pair bound; " +
          "pre-aggregate the series coarser (e.g. weekly) first")))
    val distinctOk = assert_true(
      size(expr("array_distinct(transform(pts, p -> p.t))")) ===
        size(col("pts")),
      lit("theilSen: duplicate order values produce zero-denominator " +
        "pairs (NULL slope in Spark, divide-by-zero in the oracle); " +
        "aggregate to one point per order value first"))
    n + coalesce(sizeOk.cast("long"), lit(0L)) +
      coalesce(distinctOk.cast("long"), lit(0L))
  }

  /** Grouped Theil-Sen: [[theilSen]] per key — robust trend per
    * user/source/domain, the form a production fleet actually asks
    * for. Same engine-exact rational-median discipline; the ranking
    * window is PARTITIONED by the key, so the single-partition global
    * window of the one-series form disappears entirely and the in-row
    * pair transform parallelizes per key. Keys with fewer than two
    * points have no pairs and are absent from the output (no slope is
    * definable). The per-key bounded-series and distinct-order
    * contracts are executable exactly as in [[theilSen]]. */
  def theilSenByKey(series: DataFrame, keyCol: String, orderCol: String,
                    valueCol: String,
                    maxPoints: Int = TheilSenMaxPoints,
                    coarsen: Boolean = false): DataFrame = {
    val in = if (coarsen) coarsenToBound(series, Seq(keyCol), orderCol,
      valueCol, maxPoints) else series
    val pts = in.groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col(orderCol).cast("long").as("t"),
        col(valueCol).cast("long").as("y")))).as("pts"))
    val pairs = pts
      .select(col(keyCol), theilSenGuardedN(maxPoints).as("n"),
        explode(expr(theilSenPairSql)).as("s"))
    val w = Window.partitionBy(col(keyCol)).orderBy(
      (col("s.num").cast("double") / col("s.den")).asc,
      col("s.num").asc, col("s.den").asc)
    pairs
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("n_pairs", count(lit(1)).over(
        Window.partitionBy(col(keyCol))))
      .filter(col("__rn") === expr("(n_pairs + 1) div 2"))
      .select(col(keyCol), col("n"), col("n_pairs"),
        col("s.num").as("num"), col("s.den").as("den"),
        expr("num * 1000000 div den").as("slope_micros"))
  }

  /** CUSUM mean-shift changepoint locator — "WHEN did this metric
    * shift", the question [[Behavior]]'s CUSUM drift DETECTOR (g32)
    * stops short of answering. Page (1954) cumulative sums of
    * mean-centered values; the |CUSUM| maximum is the classic
    * single-changepoint estimate (binary segmentation's first split,
    * Vostrikova 1981).
    *
    * Exact integers throughout (autocorr's n-scaled centering):
    * `c_t = n·x_t − S` and `CUSUM_k = Σ_{t≤k} c_t` are exact int64,
    * so the argmax — ties broken by smallest order value — is
    * engine-identical with no float anywhere. Output is ONE row:
    * (n, orderCol, cusum, abs_cusum) at the located point, the LAST
    * point of the left segment. CUSUM_n = 0 by construction, so a
    * constant series reports its first point with cusum 0.
    *
    * Distinct order values are an EXECUTABLE contract (the theilSen
    * guard, same class): duplicates make the cumulative sum
    * tie-order-dependent and oracle-divergent — the plan raises.
    *
    * Int64 envelope: |c_t| ≤ n·max|x| and |CUSUM| ≤ n²·max|x|; daily
    * counts for 30 years (~10⁴ points) of 10⁹-row days stay 10⁴ off
    * the edge. Scale shape: one aggregate broadcast + one ordered
    * cumulative window over the BOUNDED series (the object's standing
    * contract) + one rank pick. */
  def changepoint(series: DataFrame, orderCol: String,
                  valueCol: String): DataFrame = {
    val stats = series.agg(count(lit(1)).cast("long").as("__n"),
      sum(col(valueCol).cast("long")).as("__s"),
      count(col(orderCol)).as("__nn"),
      count_distinct(col(orderCol)).as("__nd"))
    val cum = Window.orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pick = Window.orderBy(col("__abs").desc, col(orderCol).asc)
    series.crossJoin(broadcast(stats))
      .withColumn("__c",
        col("__n") * col(valueCol).cast("long") - col("__s") +
          orderContractGuard("changepoint"))
      .withColumn("cusum", sum(col("__c")).over(cum))
      .withColumn("__abs", abs(col("cusum")))
      .withColumn("__r", row_number().over(pick))
      .filter(col("__r") === 1)
      .select(col("__n").as("n"), col(orderCol), col("cusum"),
        col("__abs").as("abs_cusum"))
  }

  /** Executable order-column contract for the ordered-window family
    * (autocorr/dominantPeriod, changepoint/changepointByKey —
    * theilSen's guard, same class), expecting the enclosing stats to
    * carry `__n` = count(*), `__nn` = count(orderCol) and `__nd` =
    * count_distinct(orderCol). Two distinct diagnoses (round-10
    * advice: count(*) vs count_distinct alone misreports a NULL order
    * value as "duplicates", and a NULL silently sorts first):
    * NULL order values raise first, then duplicates — either makes
    * the ordered window tie-order-dependent (nondeterministic,
    * oracle-divergent). Rides inside the consumed centered-value
    * expression (assert_true is NULL when its predicate holds;
    * + coalesce leaves the value untouched) so Catalyst cannot
    * prune it. */
  private def orderContractGuard(op: String) = {
    val nullOk = assert_true(col("__n") === col("__nn"),
      lit(s"$op: NULL order values cannot be ordered deterministically " +
        "(Spark sorts them first, the oracle's ORDER BY may not); " +
        "filter or impute the order column first"))
    val distinctOk = assert_true(col("__nn") === col("__nd"),
      lit(s"$op: duplicate order values make the ordered window " +
        "tie-order-dependent (nondeterministic, oracle-divergent); " +
        "aggregate to one row per order value first"))
    coalesce(nullOk.cast("long"), lit(0L)) +
      coalesce(distinctOk.cast("long"), lit(0L))
  }

  /** Grouped [[changepoint]]: the CUSUM locator per key — "WHICH
    * sources/users shifted, and when", the fleet form of the single
    * question. Every window is PARTITIONED by the key (no global
    * ordered window anywhere), so the pass is embarrassingly parallel
    * across keys — the same shape upgrade as [[theilSenByKey]] over
    * [[theilSen]]. One row per key; single-point keys report their
    * one point with cusum 0 (n·x − S = 0 at n = 1). */
  def changepointByKey(series: DataFrame, keyCol: String, orderCol: String,
                       valueCol: String): DataFrame = {
    val stats = series.groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("__n"),
        sum(col(valueCol).cast("long")).as("__s"),
        count(col(orderCol)).as("__nn"),
        count_distinct(col(orderCol)).as("__nd"))
    val cum = Window.partitionBy(keyCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pick = Window.partitionBy(keyCol)
      .orderBy(col("__abs").desc, col(orderCol).asc)
    // plain equi-join, NOT a forced broadcast: the stats table is
    // key-domain-sized, which at fleet scale (per-user keys) can be
    // millions of rows — let AQE broadcast it when it actually fits
    series.join(stats, Seq(keyCol))
      .withColumn("__c",
        col("__n") * col(valueCol).cast("long") - col("__s") +
          orderContractGuard("changepointByKey"))
      .withColumn("cusum", sum(col("__c")).over(cum))
      .withColumn("__abs", abs(col("cusum")))
      .withColumn("__r", row_number().over(pick))
      .filter(col("__r") === 1)
      .select(col(keyCol), col("__n").as("n"), col(orderCol), col("cusum"),
        col("__abs").as("abs_cusum"))
  }

  /** Multi-changepoint locator by GREEDY BINARY SEGMENTATION
    * (Vostrikova 1981; Scott & Knott 1974's recursive splitting):
    * [[changepoint]] answers "when did this metric shift ONCE"; real
    * corpora shift repeatedly. Up to `k` rounds: each round runs the
    * exact-int64 CUSUM locator on EVERY current segment
    * ([[changepointByKey]], segments as keys — one Spark job per
    * round, never per segment), then commits the single strongest
    * point (max |CUSUM|, ties by smallest order value) as a new
    * boundary and splits its segment. Stops early when the strongest
    * remaining |CUSUM| is 0 (every segment constant — a clean one-step
    * series yields exactly one row at any k).
    *
    * Engine-exact: every per-round pick is [[changepoint]]'s integer
    * argmax, so the whole greedy sequence — which point, in which
    * order — is engine-identical; an oracle unrolls the same rounds.
    *
    * Scale shape: the series is BOUNDED (the object's standing
    * contract) and `k <= 8`, so the recursion is k bounded driver
    * iterations — each collects exactly ONE row (the committed
    * boundary) and re-dispatches; the coreset sampler
    * ([[Sampling]]'s k-round driver loop) is the standing precedent.
    * The boundaries re-enter each round's plan as literals, so plan
    * depth stays CONSTANT per round (a fully-declarative unrolling
    * was rejected: round i would re-embed rounds 1..i-1 as
    * subqueries, doubling the plan per round). Segment membership is
    * computed in-row from the <= k-1 committed boundaries — no join,
    * no shuffle beyond the per-round groupBy/window pair.
    *
    * Output: one row per located point, `step` = discovery order
    * (1 = strongest): (step, n, orderCol, cusum, abs_cusum) where n
    * is the length of the segment the point split and cusum is the
    * point's within-segment CUSUM. */
  def changepoints(series: DataFrame, orderCol: String, valueCol: String,
                   k: Int): DataFrame = {
    require(k >= 1 && k <= 8, s"k must be in 1..8 (got $k)")
    val spark = series.sparkSession
    val picks = scala.collection.mutable.ArrayBuffer.empty[Row]
    var boundaries = Seq.empty[Any] // committed order values (<= k-1)
    var step = 1
    var exhausted = false
    while (step <= k && !exhausted) {
      // seg id = number of committed boundaries strictly before this
      // row (a boundary is the LAST point of its left segment)
      val segId = boundaries
        .map(v => when(col(orderCol) > lit(v), 1).otherwise(0))
        .foldLeft(lit(0))(_ + _)
      val pickW = Window.orderBy(col("abs_cusum").desc, col(orderCol).asc)
      val best = changepointByKey(
        series.select(segId.as("__seg"), col(orderCol), col(valueCol)),
        "__seg", orderCol, valueCol)
        .withColumn("__r", row_number().over(pickW))
        .filter(col("__r") === 1 && col("abs_cusum") > 0)
        .select(col("n"), col(orderCol), col("cusum"), col("abs_cusum"))
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val r = best.head
        picks += Row(step.toLong, r.getLong(0), r.get(1), r.getLong(2),
          r.getLong(3))
        boundaries = boundaries :+ r.get(1)
        step += 1
      }
    }
    val schema = StructType(Seq(
      StructField("step", LongType, nullable = false),
      StructField("n", LongType, nullable = false),
      series.schema(series.schema.fieldIndex(orderCol)),
      StructField("cusum", LongType, nullable = false),
      StructField("abs_cusum", LongType, nullable = false)))
    spark.createDataFrame(picks.toSeq.asJava, schema)
  }

  /** Default per-key point bound for [[changepointsByKey]]: the
    * greedy pass is O(k·n) in-row (never explosive like theilSen's
    * pairs), so the bound guards only the collected array's memory —
    * 2^20 points × 16 B = 16 MB per key. */
  val ChangepointsMaxPoints: Int = 1 << 20

  /** GROUPED [[changepoints]] — "WHICH sources shifted repeatedly,
    * and when", the fleet form. The single-series operator's k driver
    * rounds are the right shape for ONE series; a per-key driver loop
    * would serialize the fleet, so here the whole greedy recursion
    * runs IN-ROW over each key's collected sorted series
    * ([[graft.functions.GreedyChangepoints]], O(k·n) per key —
    * theilSen's in-row discipline applied to the recursion): one
    * groupBy, one projection, no window, no join, no driver
    * iteration; embarrassingly parallel across keys.
    *
    * Same engine-exact semantics as [[changepoints]], per key
    * (SeriesStatsSpec pins the parity); the expression raises on
    * duplicate/NULL order values (the family's executable contract)
    * and the size bound rides inside the consumed array expression.
    * Keys whose series is constant locate nothing and are absent.
    * Output: (keyCol, step, n, orderCol, cusum, abs_cusum), orderCol
    * as int64. */
  def changepointsByKey(series: DataFrame, keyCol: String,
                        orderCol: String, valueCol: String, k: Int,
                        maxPoints: Int = ChangepointsMaxPoints): DataFrame = {
    val pts = series.groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col(orderCol).cast("long").as("t"),
        col(valueCol).cast("long").as("y")))).as("pts"))
    // executable size bound, consumed inside the array the expression
    // reads (slice(pts, 1, size + 0) == pts; theilSenGuardedN's trick)
    val sizeOk = coalesce(
      assert_true(size(col("pts")) <= lit(maxPoints),
        concat(lit("changepointsByKey: series of "),
          size(col("pts")).cast("string"),
          lit(s" points exceeds the $maxPoints per-key bound; " +
            "pre-aggregate the series coarser first"))).cast("int"),
      lit(0))
    val guarded = slice(col("pts"), lit(1), size(col("pts")) + sizeOk)
    pts
      .select(col(keyCol),
        explode(graft.functions.GreedyChangepoints.of(guarded, k)).as("cp"))
      .select(col(keyCol), col("cp.step").as("step"), col("cp.n").as("n"),
        col("cp.t").as(orderCol), col("cp.cusum").as("cusum"),
        col("cp.abs_cusum").as("abs_cusum"))
  }

  /** Per-row SEASONALLY-ADJUSTED residual — the classical
    * decomposition's remainder term, the input an anomaly ranker
    * actually wants ("how far is this day from what trend + weekday
    * explain", vs [[graft.operators.Behavior]]'s raw MAD outliers
    * which flag every ordinary weekend dip). For each row with a
    * full centered window:
    *
    *   `d   = period*v_t - sum(window)`        (p-scaled detrend)
    *   `res = d - period*idx(slot)`            (remove seasonal shape)
    *
    * Both exact int64 given int64 values; `res` is in p-scaled value
    * units (divide by period for value units — left to the caller so
    * no precision is lost here). `idx` is [[seasonalIndex]]'s
    * truncated per-slot index, so `res` carries idx's sub-period
    * truncation bias (< period) — irrelevant for ranking, and the
    * price of staying engine-exact.
    *
    * Scale shape: two passes over the bounded time-domain series (one
    * ordered window, one slot groupBy) and a broadcast join of the
    * slot-sized (7/24-row) index table back onto the series. */
  def seasonalResiduals(series: DataFrame, orderCol: String,
                        valueCol: String, slotCol: String,
                        period: Int): DataFrame = {
    val d = detrended(series, orderCol, valueCol, period)
    // The broadcast side's join key gets the reserved __-prefix name:
    // joining on a column literally named "slot" would collide with a
    // caller whose slotCol is itself "slot" (drop("slot") would then
    // remove BOTH columns and the join condition would be ambiguous).
    val idx = seasonalIndex(series, orderCol, valueCol, slotCol, period)
      .select(col("slot").as("__slot"), col("idx"))
    d.join(broadcast(idx), d(slotCol) === idx("__slot"))
      .drop("__slot")
      .withColumn("res", col("__d") - lit(period.toLong) * col("idx"))
      .withColumnRenamed("__d", "d")
  }
}
