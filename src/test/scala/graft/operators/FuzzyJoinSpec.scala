package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Blocked fuzzy linkage: blocking bounds the candidate space (pairs
  * never cross blocks), the verifier is exact edit distance, and pairs
  * are canonicalized (key_a < key_b, distinct values only). */
class FuzzyJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val recs = Seq(
    ("red widget", "widget"), ("red widget", "widget"), // dup value collapses
    ("rad widget", "widget"), ("blue widget", "widget"),
    ("red gear", "gear"), ("rod gear", "gear"),
    // same edit distance as (red, rad) but different block: must NOT pair
    ("rad gizmo", "gizmo")
  ).toDF("key", "blockKey")

  test("hand case: in-block near pairs found, cross-block pairs impossible") {
    val got = FuzzyJoin.selfLinkage(recs, 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(got === Set(
      ("rad widget", "red widget", 1),
      ("red gear", "rod gear", 1)))
  }

  test("threshold edge: maxDist admits exactly <= and pairs are canonical") {
    val loose = FuzzyJoin.selfLinkage(recs, 4).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    // levenshtein("blue widget", "red widget") = 4 -> admitted exactly at 4
    assert(loose.exists(p => p._1 == "blue widget" && p._2 == "red widget" && p._3 == 4))
    assert(loose.forall(p => p._3 <= 4), s"over-threshold pair in $loose")
    assert(loose.forall(p => p._1 < p._2), s"non-canonical pair order in $loose")
    // duplicate attribute values collapse before pairing: no self-pairs
    assert(loose.forall(p => p._1 != p._2))
  }
}
