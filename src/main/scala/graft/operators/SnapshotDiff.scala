package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff (CDC derivation): given two versions of a keyed
  * table, emit each key that changed as `insert` / `delete` / `update`
  * with its before/after values — the change feed a downstream
  * incremental consumer (g18's merge, a search-index updater, a
  * replication stream) would otherwise need a CDC log to obtain.
  *
  * NOT a full-outer join: both snapshots are tagged and unioned, then
  * one hash aggregation on the key reconstructs the (old, new) pair
  * per key. Same answer, better plan — a full-outer sort-merge join
  * shuffles BOTH sides and sorts them; the union+groupBy shuffles the
  * same bytes once with map-side partial aggregation and no sort, and
  * AQE handles skewed keys as ordinary aggregation skew. Unchanged
  * keys are dropped before output: at 100 TB the diff of two mostly-
  * identical snapshots pays output proportional to the CHANGE SET,
  * never the table.
  *
  * `value` is one comparable column; wide rows diff by passing a
  * struct (or a hash) of the payload — the comparison is null-safe
  * (`<=>`), so a null payload is a value like any other.
  */
object SnapshotDiff {

  /** One row per changed key: (key, change ∈ insert|delete|update,
    * old_v, new_v). Keys present in both with equal values emit
    * nothing. Each snapshot must be unique per key (it is a snapshot). */
  def diff(old: DataFrame, neu: DataFrame, key: String,
           value: String): DataFrame = {
    val tagged = old.select(col(key), col(value).as("v"), lit(0).as("side"))
      .unionByName(neu.select(col(key), col(value).as("v"), lit(1).as("side")))
    tagged.groupBy(key).agg(
      max(when(col("side") === 0, struct(col("v")))).as("o"),
      max(when(col("side") === 1, struct(col("v")))).as("n"))
      .withColumn("change",
        when(col("o").isNull, lit("insert"))
          .when(col("n").isNull, lit("delete"))
          .when(!(col("o.v") <=> col("n.v")), lit("update")))
      .filter(col("change").isNotNull)
      .select(col(key), col("change"), col("o.v").as("old_v"),
        col("n.v").as("new_v"))
  }

  /** MERGE-apply the change feed [[diff]] emits: deletes and updates
    * remove the old row, inserts and updates add the new value — the
    * CDC consumer half of the protocol, closing the loop
    * `applyDiff(old, diff(old, neu)) == neu` (the x8 gate hashes
    * exactly that equality). The touched-key set is diff-sized, so the
    * anti-join broadcasts in the common small-delta case and untouched
    * rows stream through with no comparison work — the same
    * touched/untouched split as IncrementalAgg.merge. */
  def applyDiff(old: DataFrame, changes: DataFrame, key: String,
                value: String): DataFrame = {
    val removed = changes.filter(col("change").isin("delete", "update"))
      .select(col(key).as("__k"))
    val added = changes.filter(col("change").isin("insert", "update"))
      .select(col(key), col("new_v").as(value))
    old.join(removed, old(key) === col("__k"), "left_anti")
      .select(col(key), col(value))
      .unionByName(added)
  }
}
