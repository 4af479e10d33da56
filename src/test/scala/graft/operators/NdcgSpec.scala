package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.{GateFixtures, SparkEntry, TestSpark}

/** nDCG@5 (the n28 gate) pinned on its exactness claims: the
  * 1e6-scaled integer discount table matches round(1e6/log2(p+1))
  * literal by literal (the table is model data — a drifted constant
  * would silently re-grade every evaluation), the perfect ranker
  * scores EXACTLY 1e6 ppm on every query (dcg == idcg in integers,
  * no float residue), and the degraded ranker never exceeds it. */
class NdcgSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("discount table is the pinned integer rendering of 1/log2(p+1)") {
    assert(GateFixtures.dcgWeights(5) ==
      Seq(1000000L, 630930L, 500000L, 430677L, 386853L))
  }

  test("perfect ranker scores exactly 1e6 ppm; degraded never exceeds it") {
    val out = SparkEntry.queries("n28_ndcg_eval")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val (exact, trunc) = out.partition(_._1 == "exact")
    assert(exact.size == 5 && trunc.size == 5)
    val idcg = 5L * 1000000 + 4L * 630930 + 3L * 500000 +
      2L * 430677 + 1L * 386853
    exact.foreach { case (_, qid, dcg, ndcg) =>
      assert(dcg == idcg, s"exact dcg must equal idcg for query $qid")
      assert(ndcg == 1000000L, s"exact ndcg must be exactly 1e6 for $qid")
    }
    trunc.foreach { case (_, qid, dcg, ndcg) =>
      assert(dcg <= idcg && ndcg <= 1000000L,
        s"truncated ranker cannot beat the ideal on $qid")
      assert(ndcg == dcg * 1000000L / idcg, s"one truncating division ($qid)")
    }
  }
}
