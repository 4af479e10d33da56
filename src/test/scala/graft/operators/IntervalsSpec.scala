package graft.operators

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Intervals.unionCoverage pinned on closed-form layouts (disjoint,
  * nested, chained overlap, touching, duplicates, degenerate) and
  * against a driver-side brute-force union on random interval sets. */
class IntervalsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(iv: Seq[(Long, Long)]): (Long, Long, Long) = {
    val df = iv.map { case (s, e) => ("k", s, e) }.toDF("k", "s", "e")
    val r = Intervals.unionCoverage(df, Seq("k"), "s", "e").collect().head
    (r.getAs[Long]("n_intervals"), r.getAs[Long]("n_blocks"),
      r.getAs[Long]("covered"))
  }

  test("disjoint intervals: each its own block, lengths add") {
    assert(run(Seq((0L, 10L), (20L, 25L), (30L, 31L))) === ((3L, 3L, 16L)))
  }

  test("nested interval adds nothing") {
    assert(run(Seq((0L, 100L), (10L, 20L))) === ((2L, 1L, 100L)))
  }

  test("chained overlaps merge into one block") {
    assert(run(Seq((0L, 10L), (5L, 15L), (14L, 30L))) === ((3L, 1L, 30L)))
  }

  test("touching intervals merge and double-count nothing") {
    assert(run(Seq((0L, 10L), (10L, 20L))) === ((2L, 1L, 20L)))
  }

  test("exact duplicates: one counts, the other contributes zero") {
    assert(run(Seq((3L, 7L), (3L, 7L))) === ((2L, 1L, 4L)))
  }

  test("degenerate interval: counted, zero coverage, own block when isolated") {
    assert(run(Seq((0L, 3L), (5L, 5L), (8L, 9L))) === ((3L, 3L, 4L)))
    // inside real coverage it neither opens a block nor adds length
    assert(run(Seq((0L, 10L), (4L, 4L))) === ((2L, 1L, 10L)))
  }

  test("keys never mix") {
    val df = Seq(("a", 0L, 10L), ("b", 5L, 6L), ("a", 5L, 20L))
      .toDF("k", "s", "e")
    val m = Intervals.unionCoverage(df, Seq("k"), "s", "e").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("covered")).toMap
    assert(m === Map("a" -> 20L, "b" -> 1L))
  }

  test("random sets match a brute-force point union") {
    val rnd = new Random(42)
    for (_ <- 1 to 20) {
      val iv = Seq.fill(30)((rnd.nextInt(200).toLong,
        rnd.nextInt(200).toLong)).map { case (a, b) => (a, a + (b % 40)) }
      val (_, blocks, covered) = run(iv)
      val pts = iv.flatMap { case (s, e) => s until e }.toSet
      assert(covered === pts.size.toLong)
      // maximal runs of the covered point set = merged block count,
      // plus isolated degenerate intervals outside any covered run
      val runs =
        if (pts.isEmpty) 0L
        else pts.toSeq.sorted.foldLeft((0L, Long.MinValue)) {
          case ((n, prevPt), p) =>
            (if (p == prevPt + 1) n else n + 1, p)
        }._1
      val degenerate = iv.filter { case (s, e) => e <= s }.map(_._1).toSet
        .count(s => !pts.contains(s) && !pts.contains(s - 1))
      assert(blocks === runs + degenerate)
    }
  }
}
