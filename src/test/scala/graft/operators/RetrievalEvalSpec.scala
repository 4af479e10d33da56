package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** MRR/MAP eval (Ann.mrrMap, the n29 gate) pinned on hand-computed
  * cases: a perfect ranker scores rr = ap = 1e6 exactly (integers, no
  * float residue), a partially-relevant ranking reproduces the
  * textbook reciprocal-rank and average-precision values under
  * truncating ppm division, and a ranking with zero relevant items
  * scores 0 (not null) for both metrics. */
class RetrievalEvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ranked(rows: (Long, Long, Long)*) =
    rows.toSeq.toDF("qid", "rnk", "neighbor_id")

  private def rel(rows: (Long, Long)*) =
    rows.toSeq.toDF("qid", "neighbor_id")

  test("perfect ranking scores exactly 1e6 ppm on both metrics") {
    val r = ranked((1L, 1L, 10L), (1L, 2L, 11L), (1L, 3L, 12L))
    val g = rel((1L, 10L), (1L, 11L), (1L, 12L))
    val out = Ann.mrrMap(r, g, 3).collect()
    assert(out.length == 1)
    assert(out(0).getLong(1) == 1000000L, "rr of rank-1 hit")
    // ap_num = 1e6 + 2e6/2 + 3e6/3 = 3e6; ap = 3e6 div 3 = 1e6
    assert(out(0).getLong(2) == 1000000L, "ap of perfect ranking")
  }

  test("partial ranking reproduces the textbook values in ppm") {
    // relevant = {11, 13}; ranked = 10, 11, 12, 13 -> first hit at 2,
    // hits at ranks 2 and 4: ap_num = 1*1e6 div 2 + 2*1e6 div 4 = 1e6
    // ap = 1e6 div 2 = 500000 ppm; rr = 1e6 div 2 = 500000 ppm.
    val r = ranked((1L, 1L, 10L), (1L, 2L, 11L), (1L, 3L, 12L), (1L, 4L, 13L))
    val g = rel((1L, 11L), (1L, 13L))
    val out = Ann.mrrMap(r, g, 2).collect()
    assert(out(0).getLong(1) == 500000L)
    assert(out(0).getLong(2) == 500000L)
  }

  test("no relevant item retrieved scores 0, never null") {
    val r = ranked((1L, 1L, 10L), (1L, 2L, 11L))
    val g = rel((1L, 99L))
    val out = Ann.mrrMap(r, g, 1).collect()
    assert(!out(0).isNullAt(1) && out(0).getLong(1) == 0L)
    assert(!out(0).isNullAt(2) && out(0).getLong(2) == 0L)
  }
}
