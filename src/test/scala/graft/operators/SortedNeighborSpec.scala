package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Dedup.sortedNeighborPairs pinned on the blocking contract: the
  * candidate set equals { (a,b) : |rank(a) - rank(b)| < window } under
  * the (blockKey, doc_id) total order — computed here by a local sort
  * — and the motivating case (prefix-shaped near-dups that LSH's
  * global-similarity banding can score low) lands adjacent. */
class SortedNeighborSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "the quick brown fox jumps over a completely different tail entirely",
    3L -> "zebra yak xylophone walrus vulture",
    4L -> "apple banana cherry date elderberry",
    5L -> "apple banana cherry date fig grape",
    6L -> "the quick brown fox jumps over the lazy dog") // exact dup of 1

  private def run(window: Int): Set[(Long, Long)] =
    Dedup.sortedNeighborPairs(corpus.toDF("doc_id", "text"),
      substring(col("text"), 1, 16), window)
      .collect().toSet.map((r: org.apache.spark.sql.Row) =>
        (r.getLong(0), r.getLong(1)))

  private def brute(window: Int): Set[(Long, Long)] = {
    val ranked = corpus.sortBy { case (id, t) => (t.take(16), id) }.map(_._1)
    (for {
      i <- ranked.indices; j <- i + 1 until math.min(i + window, ranked.size)
      a = ranked(i); b = ranked(j)
    } yield (math.min(a, b), math.max(a, b))).toSet
  }

  test("candidates equal the local-sort neighbor set; prefix dups are adjacent") {
    val got = run(3)
    assert(got === brute(3))
    // docs 1, 2, 6 share a 16-char prefix -> mutually candidates
    assert(got.contains((1L, 6L)) && got.contains((1L, 2L)))
    // lexicographically distant docs are not
    assert(!got.contains((3L, 4L)) || brute(3).contains((3L, 4L)))
  }

  test("window=2 pairs only immediate neighbors") {
    assert(run(2) === brute(2))
    assert(run(2).size === corpus.size - 1)
  }
}
