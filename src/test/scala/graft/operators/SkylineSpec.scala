package graft.operators

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Skyline.frontier2d pinned on closed-form point sets, against a
  * driver-side brute-force dominance test on random data, invariant
  * to the bucket count, and idempotent (frontier of frontier). */
class SkylineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(pts: Seq[(Long, Long)], buckets: Int = 32): Set[(Long, Long, Long)] = {
    val df = pts.toDF("x", "y")
    Skyline.frontier2d(df, "x", "y", buckets).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("n_rows"))).toSet
  }

  private def brute(pts: Seq[(Long, Long)]): Set[(Long, Long, Long)] = {
    val grouped = pts.groupBy(identity).map { case (p, v) => (p._1, p._2, v.size.toLong) }
    grouped.filter { case (x, y, _) =>
      !grouped.exists { case (a, b, _) =>
        a >= x && b >= y && (a > x || b > y)
      }
    }.toSet
  }

  test("anti-chain: every point survives") {
    val pts = Seq((1L, 5L), (2L, 4L), (3L, 3L), (4L, 2L), (5L, 1L))
    assert(run(pts) === pts.map { case (a, b) => (a, b, 1L) }.toSet)
  }

  test("chain: only the maximum survives") {
    assert(run(Seq((1L, 1L), (2L, 2L), (3L, 3L))) === Set((3L, 3L, 1L)))
  }

  test("same-x column: only the max y survives; equal points aggregate") {
    assert(run(Seq((7L, 1L), (7L, 9L), (7L, 9L), (7L, 4L))) === Set((7L, 9L, 2L)))
  }

  test("dominated interior point is dropped") {
    assert(run(Seq((10L, 1L), (1L, 10L), (5L, 5L), (6L, 5L))) ===
      Set((10L, 1L, 1L), (1L, 10L, 1L), (6L, 5L, 1L)))
  }

  test("random sets match brute force at several bucket counts") {
    val rnd = new Random(7)
    for (trial <- 1 to 15) {
      val pts = Seq.fill(120)(
        (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      val expected = brute(pts)
      for (b <- Seq(1, 7, 32)) {
        assert(run(pts, b) === expected, s"trial $trial buckets $b")
      }
    }
  }

  test("idempotent: the frontier is its own frontier") {
    val rnd = new Random(11)
    val pts = Seq.fill(200)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
    val f1 = run(pts)
    val f2 = run(f1.toSeq.map { case (x, y, _) => (x, y) })
    assert(f2 === f1.map { case (x, y, _) => (x, y, 1L) })
  }
}
