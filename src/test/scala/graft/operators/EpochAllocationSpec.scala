package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Epoch allocation (Sampling.epochAllocation, the o28 gate) pinned on
  * hand-computed budgets: the decay weights are exact iterated
  * multiply-truncate powers, the prefix rule admits units in (epoch,
  * tokens desc, source) order until the cumulative cost first exceeds
  * the budget, and effective tokens discount exactly by the unit's
  * ppm weight. */
class EpochAllocationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def src(rows: (String, Long)*) = rows.toSeq.toDF("source", "tokens")

  test("weights are exact 0.9^e ppm powers and the prefix rule holds") {
    // total = 150, budget = 150*8 div 10 = 120: s1@e1 (cum 100) taken,
    // s2@e1 (cum 150) and everything after not taken.
    val out = Sampling.epochAllocation(src(("s1", 100L), ("s2", 50L)),
      8, 10, 3, 900000L)
      .orderBy("epoch", "source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.map(_._3).distinct.sorted.toSeq ==
      Seq(810000L, 900000L, 1000000L), "iterated multiply-truncate powers")
    val taken = out.filter(_._5 == 1L)
    assert(taken.map(x => (x._1, x._2)).toSeq == Seq(("s1", 1L)))
    assert(taken.head._6 == 100L, "epoch-1 effective tokens undiscounted")
    assert(out.filter(_._5 == 0L).forall(_._6 == 0L))
  }

  test("later epochs are taken when the budget allows, discounted") {
    // one source of 10 tokens, budget = 10*30 div 10 = 30: epochs 1..3
    // taken at cum 10/20/30; eff = 10, 9, 8 (900000 and 810000 ppm).
    val out = Sampling.epochAllocation(src(("s", 10L)), 30, 10, 4, 900000L)
      .orderBy("epoch").collect()
      .map(r => (r.getLong(1), r.getLong(5), r.getLong(6)))
    assert(out.toSeq == Seq((1L, 1L, 10L), (2L, 1L, 9L), (3L, 1L, 8L),
      (4L, 0L, 0L)))
  }
}
