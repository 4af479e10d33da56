package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Heaps-curve operator (TextQuality.vocabGrowth, the t37 gate)
  * pinned on a hand-computed corpus: the arithmetic doc_id-range
  * bucketing, first-appearance type counting, cumulative curves, and
  * the truncating TTR ppm — plus the structural claim that the
  * cumulative type curve is monotone and TTR never exceeds 1e6. */
class VocabGrowthSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hand-computed two-bucket curve") {
    val docs = Seq(
      (0L, "a b"), (1L, "b c"), (2L, "a d"), (3L, "d e"))
      .toDF("doc_id", "text")
    val out = TextQuality.vocabGrowth(docs, 2).orderBy("bucket")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // bucket 0 = docs 0,1: 4 tokens, first-seen {a,b,c} = 3 types
    // bucket 1 = docs 2,3: 4 tokens, first-seen {d,e} = 2 types
    assert(out(0) == ((0L, 4L, 3L, 4L, 3L, 750000L)))
    assert(out(1) == ((1L, 4L, 2L, 8L, 5L, 625000L)))
  }

  test("cumulative types are monotone and TTR is bounded by 1e6") {
    val docs = (0L until 40L).map(i =>
      (i, s"tok${i % 7} tok${i % 3} filler")).toDF("doc_id", "text")
    val out = TextQuality.vocabGrowth(docs, 5).orderBy("bucket").collect()
    val cumTypes = out.map(_.getLong(4))
    assert(cumTypes.zip(cumTypes.tail).forall { case (a, b) => a <= b })
    assert(out.forall(_.getLong(5) <= 1000000L))
    assert(out.map(_.getLong(1)).sum == 40L * 3)
  }
}
