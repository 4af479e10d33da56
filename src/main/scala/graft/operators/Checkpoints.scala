package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Registry for `localCheckpoint` RDDs created by iterative operators
  * ([[ConnectedComponents.labelPropagate]] rounds, [[Dedup
  * .suffixDupSpans]] doubling rounds), so `SparkEntry.clearCaches` can
  * release them with the same lifecycle as the persisted dedup
  * indexes.
  *
  * Needed because `Dataset.unpersist` is a cache-manager call and a
  * localCheckpoint is an RDD-level persist — unpersisting the FRAME is
  * a silent no-op and the checkpoint blocks pin executor storage until
  * driver GC happens to collect the RDD handle (CacheLifecycleSpec
  * caught exactly this). The checkpointed RDD is lifted out of the
  * frame's LogicalRDD plan at creation, which is the only moment it is
  * cheaply identifiable.
  *
  * Clearing is only safe AFTER the depending result has been consumed:
  * a localCheckpoint is non-replayable by design, so re-collecting a
  * stale handle after `clear` fails — callers rebuild through the
  * operator instead, the same contract the materialized signature
  * index documents. */
object Checkpoints {

  private val pinned =
    new java.util.concurrent.ConcurrentLinkedQueue[(SparkSession, RDD[_])]()

  /** Checkpoint `df` (eager) and register the backing RDD for
    * [[clear]]. */
  def pin(df: DataFrame): DataFrame = {
    val c = df.localCheckpoint()
    c.queryExecution.logical match {
      case lr: LogicalRDD => pinned.add((c.sparkSession, lr.rdd))
      case _ => // unexpected plan shape: nothing to track, GC reclaims
    }
    c
  }

  /** Unpersist every checkpoint RDD registered on behalf of `s`. */
  def clear(s: SparkSession): Unit = {
    val it = pinned.iterator()
    while (it.hasNext) {
      val (owner, rdd) = it.next()
      if (owner eq s) {
        rdd.unpersist(blocking = false)
        it.remove()
      }
    }
  }
}
