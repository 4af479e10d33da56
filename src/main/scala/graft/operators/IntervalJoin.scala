package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap join: all pairs (a, b) with
  * `a.start < b.end && b.start < a.end` (half-open intervals), without
  * the cartesian product the naive inequality join degenerates to.
  *
  * Both sides explode onto a fixed time grid (every bucket an interval
  * touches), the join runs as an EQUI-join on the bucket key, and the
  * true overlap predicate filters the survivors. An overlapping pair
  * meets in every shared bucket, so exactly-once emission is restored
  * by the RESPONSIBILITY rule: only the bucket containing
  * `max(a.start, b.start)` — the first bucket where both are present —
  * reports the pair. That is a per-row predicate, not a distinct: no
  * second exchange to dedup.
  *
  * Scale: shuffle volume is rows × intervals-per-bucket-width (pick
  * `bucketSeconds` ≈ the typical interval length, so the explode
  * factor stays O(1)); the join is hash-partitioned on the grid key,
  * so co-occurring intervals land together and nothing else does. A
  * pathologically long interval fans out to many buckets — cap it
  * upstream (split at the cap, the standard remedy) or size the grid
  * to the p99 width. The naive formulation is a BroadcastNestedLoop
  * over rowsA × rowsB; this is a linear-in-overlaps equi-join — the
  * difference between hours and seconds at 10^9 intervals (same
  * blocking idea as the LSH band join: meet only where you could
  * match).
  */
object IntervalJoin {

  /** Overlap join of `a` and `b` on millisecond interval columns
    * (`startCol`, `endCol`, epoch millis, half-open). Returns a-side
    * columns prefixed `a_`, b-side prefixed `b_`. */
  def overlapJoin(a: DataFrame, b: DataFrame, startCol: String,
                  endCol: String, bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0)
    val bucketMs = bucketSeconds * 1000L
    def gridded(df: DataFrame, prefix: String): DataFrame = {
      val renamed = df.columns.foldLeft(df) { (d, c) =>
        d.withColumnRenamed(c, s"$prefix$c")
      }
      // every bucket the half-open interval touches: floor(start/w) ..
      // floor((end-1)/w); an empty interval (end <= start) touches none
      renamed
        .filter(col(s"$prefix$endCol") > col(s"$prefix$startCol"))
        .withColumn("__bucket",
          explode(sequence(
            floor(col(s"$prefix$startCol") / bucketMs),
            floor((col(s"$prefix$endCol") - 1) / bucketMs))))
    }
    val ga = gridded(a, "a_")
    val gb = gridded(b, "b_")
    ga.join(gb, Seq("__bucket"))
      .filter(col(s"a_$startCol") < col(s"b_$endCol") &&
        col(s"b_$startCol") < col(s"a_$endCol"))
      // responsibility: emit only in the bucket of max(starts)
      .filter(col("__bucket") ===
        floor(greatest(col(s"a_$startCol"), col(s"b_$startCol")) / bucketMs))
      .drop("__bucket")
  }
}
