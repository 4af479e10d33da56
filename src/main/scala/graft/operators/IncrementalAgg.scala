package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-aggregate maintenance — the aggregation
  * member of the engine's incremental-index family (d15 signatures, d18
  * clusters, d21 grams, n10 IVF membership): a persisted per-key
  * snapshot of mergeable aggregates is folded forward by a delta batch
  * WITHOUT re-reading or re-shuffling the history rows.
  *
  * The snapshot stores the classic mergeable quartet per key —
  * (count, sum, min, max) — i.e. exactly the partial-aggregation state
  * Spark itself carries between map-side and final aggregation; "merge"
  * is therefore the same algebra Spark's final agg applies, expressed
  * over a stored table + a delta batch instead of over shuffle blocks.
  * Derived measures (avg = sum/count) are computed at read time, never
  * stored — storing them would make the state non-mergeable.
  *
  * 100 TB: the snapshot is key-cardinality-sized (not event-sized) and
  * the delta batch is ingest-sized, so the maintenance job costs
  * O(delta + touched keys): the batch is partially aggregated (one
  * delta-sized exchange), its key set broadcasts, and the stored
  * snapshot splits via broadcast semi/anti joins — UNTOUCHED rows pass
  * through with no shuffle (the d18 discipline), only touched rows join
  * the delta partials in a touched-sized merge. A full rebuild would
  * re-shuffle the entire event history; this never reads it at all.
  */
object IncrementalAgg {

  /** Build the per-key snapshot from raw rows: one row per `key` with
    * (n, sum_c, min_c, max_c) over the BIGINT measure `valueCol`.
    * Integer measures keep merge associative AND bit-deterministic
    * across engines and summation orders (doubles would drift in ulps,
    * breaking the incremental == rebuild equivalence this operator
    * promises). */
  def snapshot(rows: DataFrame, key: String, valueCol: String): DataFrame =
    rows.groupBy(key).agg(
      count(lit(1)).as("n"),
      sum(col(valueCol)).as("sum_c"),
      min(col(valueCol)).as("min_c"),
      max(col(valueCol)).as("max_c"))

  /** Fold a delta batch of raw rows into a stored snapshot. Returns the
    * new snapshot, bit-identical to `snapshot(history ∪ batch)`.
    * Stored rows whose key the batch never touches are passed through
    * UNCHANGED via a broadcast anti-join — the stored table is never
    * shuffled (its plan subtree contains no Exchange; pinned in
    * IncrementalAggSpec). */
  def merge(stored: DataFrame, batch: DataFrame, key: String,
            valueCol: String): DataFrame =
    mergeSnapshots(stored, snapshot(batch, key, valueCol), key)

  /** Merge two SNAPSHOTS (both already in (n, sum_c, min_c, max_c)
    * form) — the state-to-state form a streaming foreachBatch
    * maintainer commits ([[graft.streaming.EventStream
    * .maintainAggSnapshot]]): the micro-batch is partially aggregated
    * once on the executors and only its per-key state reaches the
    * store merge. */
  def mergeSnapshots(stored: DataFrame, delta: DataFrame,
                     key: String): DataFrame = {
    val touchedKeys = delta.select(key).distinct()
    val touched = stored.join(broadcast(touchedKeys), Seq(key), "left_semi")
      .unionByName(delta)
      .groupBy(key).agg(
        sum(col("n")).as("n"),
        sum(col("sum_c")).as("sum_c"),
        min(col("min_c")).as("min_c"),
        max(col("max_c")).as("max_c"))
    val untouched = stored.join(broadcast(touchedKeys), Seq(key), "left_anti")
    untouched.unionByName(touched)
  }
}
