package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Exponentially weighted moving average per key:
  * `ew_1 = v_1; ew_n = alpha * v_n + (1 - alpha) * ew_{n-1}`
  * (pandas `ewm(alpha).mean()` with `adjust=False` seeding).
  *
  * EWMA is a sequential linear recurrence — the one rolling operator a
  * window frame cannot express (every output depends on the entire
  * prefix, and the closed form `sum v_i * (1-a)^(n-i)` underflows and
  * changes the float op sequence). This is the legitimate case for the
  * per-partition imperative seam (SURVEY §2's "mapPartitions as a last
  * resort"): repartition by key so each key's rows are co-located,
  * sort within partitions on (key, order), then one linear pass
  * carrying O(1) state, resetting at key boundaries.
  *
  * Scale: one exchange on the keys (same shuffle any per-key window
  * needs), then a single streaming pass — no per-row frame scans, no
  * driver involvement. Skew behaves like any sort on the same keys.
  *
  * Float parity note: the update is written `alpha * v + (1 - alpha) *
  * state`; with alpha an exactly-representable binary fraction (0.25,
  * 0.5, ...) the oracle's recursive CTE performs the identical IEEE
  * sequence and results match bitwise.
  *
  * Nulls follow pandas `ewm(.., ignore_na=True)`: a null value emits
  * the carried-forward mean (null before any valid value) and does not
  * advance the recurrence — it is invisible to later rows' weights.
  */
object Ewma {

  /** @param orderCols must make rows unique within a key for a
    *                  deterministic recurrence order */
  def ewma(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
           valueCol: String, alpha: Double, outCol: String): DataFrame = {
    val outSchema = df.schema.add(outCol, DoubleType)
    val keyIdx = keyCols.map(df.schema.fieldIndex)
    val valIdx = df.schema.fieldIndex(valueCol)
    val parted = df.repartition(keyCols.map(col): _*)
      .sortWithinPartitions((keyCols ++ orderCols).map(col): _*)
    parted.mapPartitions { it =>
      var curKey: Seq[Any] = null
      var state = 0.0
      var seeded = false
      it.map { r =>
        val k = keyIdx.map(r.get)
        if (curKey == null || k != curKey) { curKey = k; seeded = false }
        val out: Any =
          if (r.isNullAt(valIdx)) { if (seeded) state else null }
          else {
            val v = r.getAs[Number](valIdx).doubleValue()
            state = if (!seeded) { seeded = true; v }
            else alpha * v + (1 - alpha) * state
            state
          }
        Row.fromSeq(r.toSeq :+ out)
      }
    }(Encoders.row(outSchema))
  }

  /** Holt-Winters additive seasonal (triple exponential) smoothing per
    * key — [[holt]]'s level+trend recurrence plus a length-`period`
    * seasonal state vector:
    * `sPrev = s[(n-1) mod P]` (0-seeded);
    * `l_n = alpha*(v_n - sPrev) + (1-alpha)*(l + b);`
    * `b_n = beta*(l_n - l_{n-1}) + (1-beta)*b;`
    * `s[(n-1) mod P] = gamma*(v_n - l_n) + (1-gamma)*sPrev`
    * — the first seasonal cycle degenerates to Holt (zero seasonals)
    * and the vector learns online; no two-pass seeding, so the oracle
    * recursion replays the identical IEEE sequence and parity is
    * bitwise when alpha/beta/gamma are exact binary fractions. The
    * one-step forecast adds the NEXT slot's seasonal:
    * `l_n + b_n + s[n mod P]`.
    *
    * Same secondary-sort single-pass seam as [[ewma]]/[[holt]]; the
    * carried state is P+2 doubles per key — O(period), not O(stream).
    * Nulls: emit carried (level, trend, previous-slot seasonal)
    * without advancing, null before the first valid value. */
  def holtWinters(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
                  valueCol: String, alpha: Double, beta: Double, gamma: Double,
                  period: Int, levelCol: String, trendCol: String,
                  seasonCol: String): DataFrame = {
    require(period >= 2, "period must be >= 2 (use holt for period-free)")
    val outSchema = df.schema.add(levelCol, DoubleType).add(trendCol, DoubleType)
      .add(seasonCol, DoubleType)
    val keyIdx = keyCols.map(df.schema.fieldIndex)
    val valIdx = df.schema.fieldIndex(valueCol)
    val parted = df.repartition(keyCols.map(col): _*)
      .sortWithinPartitions((keyCols ++ orderCols).map(col): _*)
    parted.mapPartitions { it =>
      var curKey: Seq[Any] = null
      var level = 0.0
      var trend = 0.0
      var season: Array[Double] = null
      var n = 0L
      var seeded = false
      it.map { r =>
        val k = keyIdx.map(r.get)
        if (curKey == null || k != curKey) {
          curKey = k; seeded = false; n = 0L
          season = new Array[Double](period)
        }
        val out: Seq[Any] =
          if (r.isNullAt(valIdx)) {
            if (seeded) Seq(level, trend, season(((n - 1) % period).toInt))
            else Seq(null, null, null)
          } else {
            val v = r.getAs[Number](valIdx).doubleValue()
            n += 1
            val idx = ((n - 1) % period).toInt
            if (!seeded) { seeded = true; level = v; trend = 0.0 }
            else {
              val sPrev = season(idx)
              val prev = level
              level = alpha * (v - sPrev) + (1 - alpha) * (level + trend)
              trend = beta * (level - prev) + (1 - beta) * trend
              season(idx) = gamma * (v - level) + (1 - gamma) * sPrev
            }
            Seq(level, trend, season(idx))
          }
        Row.fromSeq(r.toSeq ++ out)
      }
    }(Encoders.row(outSchema))
  }

  /** Default per-key point bound for [[holtWintersByKey]]: the fold is
    * O(n·P) per key in-row; the bound guards the collected array's
    * memory (2^20 points × ~24 B ≈ 24 MB per key). */
  val HoltWintersMaxPoints: Int = 1 << 20

  /** GROUPED Holt-Winters FORECAST STATE — the fleet form of
    * [[holtWinters]] (a14/a16/a19/a20's shape applied to the smoothing
    * family): per key, the FINAL (level, trend) and the one-step
    * forecast `level + trend + season[n mod P]`, computed by ONE
    * in-row array fold over the key's collected, order-sorted series
    * — one groupBy exchange, no window, no join, no per-key driver
    * work; embarrassingly parallel across a million-key fleet. The
    * per-row form [[holtWinters]] remains the right tool when every
    * intermediate smoothed row is the product; this is the "one
    * forecast row per key" production ask (capacity planning, anomaly
    * thresholds), where materializing every intermediate is waste.
    *
    * Identical recurrence, identical IEEE op sequence, per key
    * (HoltWintersSpec pins last-row parity against [[holtWinters]]
    * bitwise): zero-seeded seasonals, first valid value seeds
    * (level=v, trend=0), nulls are ignore_na (do not advance, n
    * counts valid values only). Keys with no valid value emit
    * n=0 with NULL level/trend/forecast.
    *
    * Bounded-series contract is EXECUTABLE (the changepointsByKey
    * pattern): past `maxPoints` the plan raises — pre-aggregate the
    * series coarser first.
    *
    * `orderCols` must make rows unique within a key (the family's
    * standing recurrence-order contract). Output: (keyCols*, n,
    * level, trend, forecast). */
  def holtWintersByKey(df: DataFrame, keyCols: Seq[String],
                       orderCols: Seq[String], valueCol: String,
                       alpha: Double, beta: Double, gamma: Double,
                       period: Int,
                       maxPoints: Int = HoltWintersMaxPoints): DataFrame = {
    require(period >= 2, "period must be >= 2 (use holt for period-free)")
    import org.apache.spark.sql.Column
    val pts = df.groupBy(keyCols.map(col): _*)
      .agg(sort_array(collect_list(struct(
        orderCols.map(col) :+ col(valueCol).cast("double").as("__v"): _*)))
        .as("__pts"))
    val sizeOk = coalesce(
      assert_true(size(col("__pts")) <= lit(maxPoints),
        concat(lit("holtWintersByKey: series of "),
          size(col("__pts")).cast("string"),
          lit(s" points exceeds the $maxPoints per-key bound; " +
            "pre-aggregate the series coarser first"))).cast("int"),
      lit(0))
    val guarded = slice(col("__pts"), lit(1), size(col("__pts")) + sizeOk)
    val init = struct(lit(0.0).as("l"), lit(0.0).as("b"),
      array_repeat(lit(0.0), period).as("s"), lit(0L).as("n"),
      lit(false).as("sd"))
    def step(acc: Column, x: Column): Column = {
      val v = x.getField("__v")
      val n1 = acc.getField("n") + lit(1L)
      val idx = ((n1 - 1) % period).cast("int")
      val sPrev = element_at(acc.getField("s"), idx + 1)
      val l0 = acc.getField("l")
      val b0 = acc.getField("b")
      val sd = acc.getField("sd")
      // newL is re-evaluated inside newB/newS: identical IEEE inputs
      // give identical bits, and the oracle recursion re-evaluates the
      // same way (a8's CTE) — determinism by construction, per key
      val newL = when(!sd, v)
        .otherwise(lit(alpha) * (v - sPrev) + lit(1 - alpha) * (l0 + b0))
      val newB = when(!sd, lit(0.0))
        .otherwise(lit(beta) * (newL - l0) + lit(1 - beta) * b0)
      val newS = when(!sd, sPrev)
        .otherwise(lit(gamma) * (v - newL) + lit(1 - gamma) * sPrev)
      when(v.isNull, acc).otherwise(struct(
        newL.as("l"), newB.as("b"),
        transform(acc.getField("s"),
          (e, i) => when(i === idx, newS).otherwise(e)).as("s"),
        n1.as("n"), lit(true).as("sd")))
    }
    def fin(acc: Column): Column = {
      val sNext = element_at(acc.getField("s"),
        (acc.getField("n") % period).cast("int") + 1)
      struct(acc.getField("n").as("n"),
        when(acc.getField("sd"), acc.getField("l")).as("level"),
        when(acc.getField("sd"), acc.getField("b")).as("trend"),
        when(acc.getField("sd"),
          acc.getField("l") + acc.getField("b") + sNext).as("forecast"))
    }
    pts
      .withColumn("__hw", aggregate(guarded, init, step, fin))
      .select((keyCols.map(col) ++ Seq(col("__hw.n").as("n"),
        col("__hw.level").as("level"), col("__hw.trend").as("trend"),
        col("__hw.forecast").as("forecast"))): _*)
  }

  /** Holt linear-trend (double exponential) smoothing per key — the
    * level+trend recurrence:
    * `l_1 = v_1, b_1 = 0;`
    * `l_n = alpha*v_n + (1-alpha)*(l_{n-1} + b_{n-1});`
    * `b_n = beta*(l_n - l_{n-1}) + (1-beta)*b_{n-1}`
    * — the standard short-horizon forecaster (the one-step forecast is
    * `l + b`). Like EWMA this is a sequential recurrence no window
    * frame expresses; same secondary-sort single-pass seam, now with
    * TWO carried doubles. With alpha/beta exactly-representable binary
    * fractions the oracle's recursive CTE replays the identical IEEE
    * op sequence — bitwise parity, no rounding hedge needed.
    *
    * Nulls: emit the carried (level, trend) without advancing (null
    * before the first valid value), matching [[ewma]]'s ignore_na. */
  def holt(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
           valueCol: String, alpha: Double, beta: Double,
           levelCol: String, trendCol: String): DataFrame = {
    val outSchema = df.schema.add(levelCol, DoubleType).add(trendCol, DoubleType)
    val keyIdx = keyCols.map(df.schema.fieldIndex)
    val valIdx = df.schema.fieldIndex(valueCol)
    val parted = df.repartition(keyCols.map(col): _*)
      .sortWithinPartitions((keyCols ++ orderCols).map(col): _*)
    parted.mapPartitions { it =>
      var curKey: Seq[Any] = null
      var level = 0.0
      var trend = 0.0
      var seeded = false
      it.map { r =>
        val k = keyIdx.map(r.get)
        if (curKey == null || k != curKey) { curKey = k; seeded = false }
        val out: Seq[Any] =
          if (r.isNullAt(valIdx)) {
            if (seeded) Seq(level, trend) else Seq(null, null)
          } else {
            val v = r.getAs[Number](valIdx).doubleValue()
            if (!seeded) { seeded = true; level = v; trend = 0.0 }
            else {
              val prev = level
              level = alpha * v + (1 - alpha) * (level + trend)
              trend = beta * (level - prev) + (1 - beta) * trend
            }
            Seq(level, trend)
          }
        Row.fromSeq(r.toSeq ++ out)
      }
    }(Encoders.row(outSchema))
  }
}
