package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Greedy binary-segmentation multi-changepoint locator as a scalar
  * Catalyst expression over ONE collected series — the fleet form of
  * [[graft.operators.SeriesStats.changepoints]]: that operator's k
  * driver rounds are the right shape for ONE series, but a per-key
  * driver loop would serialize the fleet ("which of a million sources
  * shifted repeatedly" must not collect per key). Here the whole
  * greedy recursion — k rounds of per-segment exact-int64 CUSUM
  * argmax over a SORTED (t, x) array — runs in-row, O(k·n) per key
  * with zero allocation beyond two scratch arrays, so
  * `changepointsByKey` is an ordinary groupBy + projection:
  * embarrassingly parallel across keys, no window, no join, no
  * driver iteration (theilSen's in-row pair-transform discipline,
  * applied to the recursion instead of the pair set).
  *
  * Semantics are IDENTICAL to the single-series operator (same
  * argmax, same ties by smallest t, same strongest-segment-first
  * greedy order, same stop-when-all-constant): SeriesStatsSpec pins
  * the per-key ≡ single-series parity. Input contract (raised, not
  * silent): non-null sorted struct array, distinct t values —
  * duplicates would make the within-segment cumulative sum
  * tie-order-dependent, the family's standing executable contract.
  *
  * Output: array of (step, n, t, cusum, abs_cusum) structs, step =
  * discovery order, n = the split segment's length; empty array for
  * a constant (or empty) series. Int64 envelope: |cusum| ≤ n²·max|x|
  * per SEGMENT — the [[graft.operators.SeriesStats.changepoint]]
  * envelope, per key. */
case class GreedyChangepoints(child: Expression, k: Int)
  extends UnaryExpression with CodegenFallback {

  require(k >= 1 && k <= 8, s"k must be in 1..8 (got $k)")

  override def dataType: DataType = GreedyChangepoints.outType

  override def nullable: Boolean = true

  protected override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val ts = new Array[Long](n)
    val xs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 2)
      require(row != null && !row.isNullAt(0) && !row.isNullAt(1),
        "greedy_changepoints: NULL order or value — filter or impute first")
      ts(i) = row.getLong(0)
      xs(i) = row.getLong(1)
      if (i > 0) require(ts(i) > ts(i - 1),
        "greedy_changepoints: duplicate (or unsorted) order values make " +
          "the cumulative sum tie-order-dependent; aggregate to one row " +
          "per order value and sort_array first")
      i += 1
    }
    // boundaries = indices of committed changepoints (each the LAST
    // point of its left segment), kept sorted; segments are the
    // half-open index ranges between them
    val bounds = new Array[Int](k)
    var nBounds = 0
    val out = new Array[InternalRow](k)
    var step = 0
    var exhausted = n == 0
    while (step < k && !exhausted) {
      // global best across segments: (abs, t) with abs desc, t asc
      var bestAbs = 0L
      var bestT = 0L
      var bestCusum = 0L
      var bestIdx = -1
      var bestN = 0L
      var segStart = 0
      var b = 0
      while (segStart < n) {
        val segEnd = if (b < nBounds) bounds(b) + 1 else n // exclusive
        val segLen = segEnd - segStart
        var s = 0L
        var j = segStart
        while (j < segEnd) { s += xs(j); j += 1 }
        var cum = 0L
        j = segStart
        while (j < segEnd) {
          cum += segLen.toLong * xs(j) - s
          val a = math.abs(cum)
          if (bestIdx < 0 || a > bestAbs || (a == bestAbs && ts(j) < bestT)) {
            bestAbs = a; bestT = ts(j); bestCusum = cum
            bestIdx = j; bestN = segLen.toLong
          }
          j += 1
        }
        segStart = segEnd
        b += 1
      }
      if (bestIdx < 0 || bestAbs == 0L) exhausted = true
      else {
        out(step) = InternalRow((step + 1).toLong, bestN, bestT,
          bestCusum, bestAbs)
        // insert bestIdx into bounds, keeping sorted
        var p = nBounds
        while (p > 0 && bounds(p - 1) > bestIdx) {
          bounds(p) = bounds(p - 1); p -= 1
        }
        bounds(p) = bestIdx
        nBounds += 1
        step += 1
      }
    }
    new GenericArrayData(out.take(step).asInstanceOf[Array[Any]])
  }

  protected override def withNewChildInternal(newChild: Expression): GreedyChangepoints =
    copy(child = newChild)

  override def prettyName: String = "greedy_changepoints"
}

object GreedyChangepoints {
  val outType: DataType = ArrayType(StructType(Seq(
    StructField("step", LongType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("t", LongType, nullable = false),
    StructField("cusum", LongType, nullable = false),
    StructField("abs_cusum", LongType, nullable = false))),
    containsNull = false)

  /** Column form over a sorted array<struct<t: long, x: long>>. */
  def of(pts: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(GreedyChangepoints(Bridge.expression(pts), k))
  }
}
