package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution DRIFT monitoring between two corpus snapshots — the
  * Population Stability Index (PSI), the standard model/feature
  * monitoring metric: `PSI = Σ_buckets (p_i − q_i)·ln(p_i/q_i)` with
  * p from the reference sample and q from the current one. The
  * training-data use case: detect when an ingest source's value/
  * length/score distribution shifts between pipeline runs (a scraper
  * change, a new boilerplate pattern, a unit regression) BEFORE the
  * shifted data trains anything. Common operating points: <0.1 stable,
  * 0.1–0.25 moderate, >0.25 action.
  *
  * Buckets are [[graft.functions.LogHistogram]]'s engine-exact base-2
  * relative-error rule (keep the top k+1 significant bits — pure
  * integer shifts, so the same bucket boundaries reproduce in ANY
  * engine and across runs; a float-boundary histogram would make the
  * drift metric itself drift). Add-one smoothing keeps empty buckets
  * finite, and because (p−q)·ln(p/q) is symmetric in (p,q) the metric
  * is direction-free (DriftSpec pins it).
  *
  * Scale shape: each side is one linear scan into a per-(group,
  * bucket) partial aggregation; the join and windows run on the
  * BUCKET table (groups × ≤ a few hundred rows — bounded, like the
  * sketch-extraction tables), never on the corpus. At 100 TB the two
  * sides are typically stored [[graft.functions.LogHistogram]]
  * sketches from different runs — PSI then reads two sketch tables
  * and touches no raw data at all.
  */
object Drift {

  /** The bucket rule as SQL — identical arithmetic to
    * `LogHistogram.bucketFloor` (values below 2^(k+1) exact, else the
    * top k+1 significant bits), spelled with `bin()`/shifts so any
    * engine replays it bit-for-bit. Requires v >= 0. */
  def bucketFloorExpr(valueCol: String, k: Int): Column = {
    val exact = 1L << (k + 1)
    expr(s"CASE WHEN $valueCol < ${exact}L THEN $valueCol " +
      s"ELSE shiftleft(shiftright($valueCol, length(bin($valueCol)) - ${k + 1}), " +
      s"length(bin($valueCol)) - ${k + 1}) END")
  }

  /** One side's per-(group, bucket) counts — the TABLE form of the
    * distribution. `side` names the count column (n_ref / n_cur).
    * This is what a pipeline run PERSISTS (a few hundred rows per
    * group); later drift checks then read two stored bucket tables
    * via [[psiFromBuckets]] and touch no raw data. */
  def bucketCounts(df: DataFrame, groupCols: Seq[String], valueCol: String,
                   k: Int, side: String): DataFrame =
    df.select(groupCols.map(col) :+
        bucketFloorExpr(valueCol, k).as("lo"): _*)
      .groupBy((groupCols :+ "lo").map(col): _*)
      .agg(count(lit(1)).as(s"n_$side"))

  /** Per-group PSI of `valueCol` (non-negative long) between `ref`
    * and `cur`: (groupCols..., n_ref, n_cur, n_buckets, psi). `psi`
    * is unrounded — gates round; thresholds don't need to. */
  def psi(ref: DataFrame, cur: DataFrame, groupCols: Seq[String],
          valueCol: String, k: Int): DataFrame =
    psiFromBuckets(bucketCounts(ref, groupCols, valueCol, k, "ref"),
      bucketCounts(cur, groupCols, valueCol, k, "cur"), groupCols)

  /** PSI from two ALREADY-BUCKETED count tables (groupCols + lo +
    * n_ref / n_cur) — both sides must share the same bucket rule
    * ([[bucketCounts]] with equal k). The 100 TB form: both sides are
    * stored bucket tables from different runs, and the whole
    * computation is bounded by groups × buckets. */
  def psiFromBuckets(refBuckets: DataFrame, curBuckets: DataFrame,
                     groupCols: Seq[String]): DataFrame = {
    val joined = refBuckets
      .join(curBuckets, groupCols :+ "lo", "full_outer")
      .na.fill(0L, Seq("n_ref", "n_cur"))
    // totals over the BOUNDED bucket table — not the corpus
    val w = Window.partitionBy(groupCols.map(col): _*)
    val p = (col("n_ref") + 1).cast("double") / (col("tot_ref") + col("b"))
    val q = (col("n_cur") + 1).cast("double") / (col("tot_cur") + col("b"))
    joined
      .withColumn("tot_ref", sum(col("n_ref")).over(w))
      .withColumn("tot_cur", sum(col("n_cur")).over(w))
      .withColumn("b", count(lit(1)).over(w))
      .groupBy(groupCols.map(col): _*)
      .agg(max(col("tot_ref")).as("n_ref"), max(col("tot_cur")).as("n_cur"),
        max(col("b")).as("n_buckets"),
        sum((p - q) * log(p / q)).as("psi"))
  }
}
