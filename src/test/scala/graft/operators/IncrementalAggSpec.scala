package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** IncrementalAgg pinned on its one promise — merge(stored, batch) is
  * bit-identical to a rebuild over history ∪ batch — plus the plan
  * shape that makes it incremental: the stored snapshot is split by
  * BROADCAST joins and never re-shuffled. */
class IncrementalAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val history = Seq(
    (1L, 10L), (1L, -3L), (2L, 7L), (3L, 100L), (3L, 1L), (4L, 0L))
  private val batch = Seq(
    (1L, 50L), (3L, -200L), (5L, 9L)) // touches 1,3; new key 5; 2,4 untouched

  private def rows(xs: Seq[(Long, Long)]) = xs.toDF("k", "v")

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq

  test("merge == rebuild, including untouched, touched, and new keys") {
    val stored = IncrementalAgg.snapshot(rows(history), "k", "v")
    val merged = IncrementalAgg.merge(stored, rows(batch), "k", "v")
    val rebuilt = IncrementalAgg.snapshot(rows(history ++ batch), "k", "v")
    assert(canon(merged) === canon(rebuilt))
    // spot-check the algebra by hand: key 1 = {10, -3, 50}
    val k1 = canon(merged).find(_._1 == 1L).get
    assert(k1 === ((1L, 3L, 57L, -3L, 50L)))
  }

  test("an empty batch returns the snapshot unchanged") {
    val stored = IncrementalAgg.snapshot(rows(history), "k", "v")
    val merged = IncrementalAgg.merge(stored, rows(Seq.empty), "k", "v")
    assert(canon(merged) === canon(stored))
  }

  test("merge is associative: two batches == one concatenated batch") {
    val (b1, b2) = batch.splitAt(2)
    val s0 = IncrementalAgg.snapshot(rows(history), "k", "v")
    val twoStep = IncrementalAgg.merge(
      IncrementalAgg.merge(s0, rows(b1), "k", "v"), rows(b2), "k", "v")
    val oneStep = IncrementalAgg.merge(s0, rows(batch), "k", "v")
    assert(canon(twoStep) === canon(oneStep))
  }

  test("plan: stored snapshot splits via broadcast joins, never shuffles") {
    import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftSemi}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    // stored arrives as a read table (no lineage back to raw rows) —
    // the production shape; only the DELTA may pay hash exchanges
    val stored = IncrementalAgg.snapshot(rows(history), "k", "v")
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toDF("k", "n", "sum_c", "min_c", "max_c")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val exec = IncrementalAgg.merge(stored, rows(batch), "k", "v")
        .queryExecution.executedPlan
      val bhj = exec.collect { case j: BroadcastHashJoinExec => j }
      assert(bhj.exists(_.joinType == LeftSemi) &&
        bhj.exists(_.joinType == LeftAnti),
        s"stored split should be broadcast semi+anti:\n$exec")
      // THE incremental promise: no shuffle anywhere above the stored
      // relation on either split path — untouched rows stream through
      // the anti join, touched rows enter the merge agg pre-exchange
      for (j <- bhj) {
        val shuffled = j.left.collect { case e: ShuffleExchangeExec => e }
        assert(shuffled.isEmpty,
          s"stored side of ${j.joinType} shuffles:\n$exec")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
