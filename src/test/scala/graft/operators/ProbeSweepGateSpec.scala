package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The gated probe-sweep table (n30) pinned on IvfProbeSweepSpec's
  * claims at the gate's own shape: per query, recall is monotone in
  * nprobe (candidate sets are nested), and the full probe (5 of 5
  * cells) recalls exactly 1e6 ppm — the inverted file is a partition
  * of the corpus, so probing every cell IS brute force. */
class ProbeSweepGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("gate table: monotone per query, exact at full probe") {
    val out = graft.SparkEntry
      .queries("n30_ivf_probe_sweep")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    assert(out.length == 15, "3 nprobe settings x 5 queries")
    val byQid = out.groupBy(_._2)
    byQid.values.foreach { rows =>
      val byProbe = rows.sortBy(_._1).map(_._3)
      assert(byProbe.zip(byProbe.tail).forall { case (a, b) => a <= b },
        s"recall fell as nprobe grew: ${rows.toSeq}")
    }
    out.filter(_._1 == 5L).foreach { case (_, qid, rec) =>
      assert(rec == 1000000L, s"full probe must be exact for query $qid")
    }
  }
}
