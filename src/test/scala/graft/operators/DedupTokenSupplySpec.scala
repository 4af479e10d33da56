package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Dedup-aware token supply (Dedup.dedupTokenSupply, the o29 gate)
  * pinned on a hand-computed corpus: keep = min doc_id per
  * identical-text group ACROSS sources (a cross-source copy is fresh
  * in neither source), kept tokens sum only over keepers, and the
  * duplicated-token ppm is the truncating division of the loss over
  * the raw supply. */
class DedupTokenSupplySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cross-source copies count as duplicate supply in the copy's source") {
    val docs = Seq(
      (1L, "web", "x y z"),       // keeper of the "x y z" family
      (2L, "web", "a b"),         // unique
      (3L, "books", "x y z"),     // cross-source copy -> dup in books
      (4L, "books", "c d e f"))   // unique
      .toDF("doc_id", "source", "text")
    val out = Dedup.dedupTokenSupply(docs)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out(0) == (("books", 2L, 7L, 1L, 4L, 3L * 1000000L / 7L)))
    assert(out(1) == (("web", 2L, 5L, 2L, 5L, 0L)))
  }
}
