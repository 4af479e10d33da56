package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Dedup pair-eval (Dedup.exactPairs + Dedup.pairEval, the d33 gate)
  * pinned on hand-computed sets: exactPairs expands identical-text
  * families into all (a < b) pairs and nothing else; pairEval's
  * tp/fp/fn partition the union and the ppm ratios follow the
  * truncating-division formula; disjoint prediction and gold yield
  * zero precision/recall/F1 without dividing by zero. */
class PairEvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("exactPairs expands identical-text families, in-row, a < b") {
    val docs = Seq(
      (1L, "same text"), (2L, "same text"), (5L, "same text"),
      (3L, "other"), (4L, "unique")).toDF("doc_id", "text")
    val got = Dedup.exactPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (1L, 5L), (2L, 5L)))
  }

  test("pairEval partitions the union into tp/fp/fn with exact ppm") {
    val pred = Seq((1L, 2L), (1L, 3L), (4L, 5L)).toDF("doc_a", "doc_b")
    val gold = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val r = Dedup.pairEval(pred, gold).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((1L, 2L, 1L)))
    assert(r.getLong(3) == 1000000L / 3, "precision = tp/(tp+fp)")
    assert(r.getLong(4) == 500000L, "recall = tp/(tp+fn)")
    // f1 = 2*333333*500000 div 833333 = 399999 (truncating harmonic mean)
    assert(r.getLong(5) == 2L * 333333L * 500000L / 833333L)
  }

  test("disjoint sets score zero without division errors") {
    val pred = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val gold = Seq((3L, 4L)).toDF("doc_a", "doc_b")
    val r = Dedup.pairEval(pred, gold).collect()(0)
    assert(r.getLong(0) == 0L && r.getLong(3) == 0L &&
      r.getLong(4) == 0L && r.getLong(5) == 0L)
  }
}
