package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The gated dedup threshold sweep (d34) pinned on its curve claims:
  * byte-identical copies share a simhash (Hamming 0), so TRUE-copy
  * recall is 1e6 at EVERY radius (the pigeonhole guarantee, rung by
  * rung) and tp is constant; opening the radius can only ADD
  * predicted pairs, so fp is non-decreasing and precision
  * non-increasing — the monotone trade-off the operating-point pick
  * rests on. */
class DedupThresholdSweepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("gate table: recall pinned at 1e6, precision monotone down " +
    "the opening radius") {
    val out = graft.SparkEntry
      .queries("d34_dedup_threshold_sweep")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(4), r.getLong(5)))
      .sortBy(_._1) // (radius, tp, fp, precision_ppm, recall_ppm)
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(out.forall(_._5 == 1000000L),
      s"true-copy recall must be exact at every radius: ${out.toSeq}")
    assert(out.map(_._2).distinct.length == 1,
      s"tp must be constant across radii: ${out.toSeq}")
    val fps = out.map(_._3)
    assert(fps.zip(fps.tail).forall { case (a, b) => a <= b },
      s"fp must be non-decreasing as the radius opens: ${out.toSeq}")
    val precs = out.map(_._4)
    assert(precs.zip(precs.tail).forall { case (a, b) => a >= b },
      s"precision must be non-increasing as the radius opens: ${out.toSeq}")
  }
}
