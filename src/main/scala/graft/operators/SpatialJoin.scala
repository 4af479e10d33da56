package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid-blocked fixed-radius 2D near-neighbor join.
  *
  * The naive formulation — an inequality join `ON dist(a,b) <= r` —
  * plans as a cartesian product: every row pair is generated and then
  * filtered, quadratic in the input. The scale shape blocks space into
  * square cells of side `radius`: any two points within `radius` of
  * each other lie in the same cell or in one of its 8 neighbors, so
  * the build side is replicated into its 3x3 cell neighborhood (a
  * CONSTANT factor 9) and the join becomes an equi-join on the cell
  * key. Catalyst plans a plain shuffled hash/sort-merge join — both
  * sides partition by cell, candidates are verified with the exact
  * integer distance, and no pair outside neighboring cells is ever
  * materialized.
  *
  * Each qualifying ordered pair is emitted exactly once: the probe
  * row's REAL cell matches exactly one of the build row's 9 replicas,
  * so no post-join distinct is needed (a distinct here would be a
  * second full exchange of the candidate set).
  *
  * At 100 TB: cells shuffle-partition uniformly for near-uniform point
  * sets; a hot cell (urban-density skew) salts like any hot join key,
  * and AQE's skew-join split handles moderate cases for free.
  * Coordinates are integral (cents / fixed-precision grid units) so
  * the distance verify is exact int64 math — no float boundary
  * ambiguity at the radius cut.
  */
object SpatialJoin {

  /** All ordered pairs (key_a, key_b, d2) with key_a != key_b and
    * squared Euclidean distance d2 <= radius^2. `points` must carry
    * integral columns (keyCol, xCol, yCol); both coordinate signs
    * work — cell keys come from exact integer floor-division
    * (`div` truncates toward zero; a negative non-exact quotient is
    * corrected by one, so the form floors toward -inf WITHOUT the
    * intermediate subtraction that would overflow near Long.MinValue)
    * — never a double cast (a double cast mis-buckets
    * |coord| >= 2^53).
    *
    * int64 arithmetic envelope: `radius <= 1518500249` so that the
    * squared distance of ANY cell-adjacent candidate pair
    * (|delta| < 2*radius) stays inside int64 — a bigger bound would
    * let dx*dx wrap negative and emit false "within radius" pairs;
    * and coordinates must satisfy |coord| <= Long.MaxValue - 2*radius
    * (precondition, like the radius bound) so neighbor-cell indices
    * and coordinate differences of candidate pairs cannot wrap.
    */
  def radiusJoin(points: DataFrame, keyCol: String, xCol: String,
                 yCol: String, radius: Long): DataFrame = {
    require(radius > 0, "radius must be positive")
    require(radius <= 1518500249L,
      s"radius=$radius: (2*radius)^2 must fit int64 (max 1518500249) — " +
        "beyond it a candidate pair's squared distance wraps negative " +
        "and passes the radius cut")
    def cell(c: String): Column =
      expr(s"(`$c` div ${radius}L) - " +
        s"(CASE WHEN `$c` % ${radius}L < 0 THEN 1 ELSE 0 END)")
    // Spread the probe side across the session's parallelism BEFORE
    // the candidate join (round 16): a dense grid fans each probe row
    // out to every point of its 3x3 cell neighborhood — hundreds of
    // candidates per row — so generation parallelism must track the
    // OUTPUT volume, not the input's scan split count. A small points
    // table arrives as one scan task and would otherwise generate the
    // entire candidate set single-threaded behind the broadcast join
    // (measured at sf0.1: 2.3 s -> 0.55 s warm for the j13 candidate
    // pass). The exchange moves only (key, x, y) — narrow rows, paid
    // once, amortized by the fan-out on any input size.
    val parts = points.sparkSession.sessionState.conf.numShufflePartitions
    val probe = points.repartition(parts)
      .select(col(keyCol).as("key_a"), col(xCol).as("__xa"),
      col(yCol).as("__ya"), cell(xCol).as("__cx"), cell(yCol).as("__cy"))
    val offsets = for (dx <- -1L to 1L; dy <- -1L to 1L)
      yield struct(lit(dx).as("dx"), lit(dy).as("dy"))
    val build = points.select(col(keyCol).as("key_b"), col(xCol).as("__xb"),
        col(yCol).as("__yb"), cell(xCol).as("__bcx"), cell(yCol).as("__bcy"))
      .withColumn("__o", explode(array(offsets: _*)))
      .select(col("key_b"), col("__xb"), col("__yb"),
        (col("__bcx") + col("__o.dx")).as("__cx"),
        (col("__bcy") + col("__o.dy")).as("__cy"))
    val d2 = (col("__xa") - col("__xb")) * (col("__xa") - col("__xb")) +
      (col("__ya") - col("__yb")) * (col("__ya") - col("__yb"))
    probe.join(build, Seq("__cx", "__cy"))
      .filter(col("key_a") =!= col("key_b") && d2 <= lit(radius * radius))
      .select(col("key_a"), col("key_b"), d2.cast("long").as("d2"))
  }
}
