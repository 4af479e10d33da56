package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Dedup.simhashHammingJoin pinned on the pigeonhole claim: banding on
  * 4x15-bit bands has PERFECT recall at Hamming distance <= 3, so the
  * operator must equal the brute-force all-pairs popcount join over
  * the same fingerprints — no near pair may be lost to banding, and
  * multi-band agreement must not double-emit a pair. */
class SimhashJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // Shared-token texts produce close fingerprints; disjoint-token
  // texts produce far ones. Exact dups land at Hamming 0.
  private val corpus = Seq(
    1L -> "alpha beta gamma delta epsilon zeta eta theta",
    2L -> "alpha beta gamma delta epsilon zeta eta iota", // near-dup of 1
    3L -> "alpha beta gamma delta epsilon zeta eta theta", // exact dup of 1
    4L -> "one two three four five six seven eight nine ten",
    5L -> "pack my box with five dozen liquor jugs today",
    6L -> "alpha beta gamma delta epsilon zeta kappa lambda")

  private def fingerprints: Map[Long, Long] =
    Dedup.simhash60(corpus.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def brute(maxHam: Int): Set[(Long, Long, Int)] = {
    val fp = fingerprints
    (for {
      a <- fp.keys; b <- fp.keys if a < b
      ham = java.lang.Long.bitCount(fp(a) ^ fp(b))
      if ham <= maxHam
    } yield (a, b, ham)).toSet
  }

  test("banded join equals brute-force popcount join; exact dup at distance 0") {
    val got = Dedup.simhashHammingJoin(corpus.toDF("doc_id", "text"), 3)
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.toSet === brute(3))
    assert(got.size === got.toSet.size, "multi-band agreement double-emitted a pair")
    assert(got.toSet.contains((1L, 3L, 0)), "exact dup must surface at Hamming 0")
  }

  test("maxHamming above the banding guarantee is rejected") {
    intercept[IllegalArgumentException] {
      Dedup.simhashHammingJoin(corpus.toDF("doc_id", "text"), 4)
    }
  }
}
