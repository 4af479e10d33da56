package graft.operators

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Sampling.kCenterCoreset against a driver-side replay of
  * farthest-first traversal, plus the geometric anchors: corners of a
  * square get picked before interior points, and the recorded radius
  * sequence is non-increasing after the first pick (a farthest-first
  * invariant). */
class CoresetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(pts: Seq[(Long, Long, Long)], k: Int): Seq[(Long, Long, Option[Long])] = {
    val df = pts.toDF("id", "x", "y")
    Sampling.kCenterCoreset(df, "id", Seq("x", "y"), k).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.getAs[java.lang.Long]("radius_sq")).map(_.toLong)))
      .toSeq.sortBy(_._1)
  }

  private def ref(pts: Seq[(Long, Long, Long)], k: Int): Seq[(Long, Option[Long])] = {
    def d2(a: (Long, Long, Long), b: (Long, Long, Long)): Long =
      (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
    var sel = Seq(pts.minBy(_._1))
    var acc = Seq((sel.head._1, Option.empty[Long]))
    for (_ <- 1 until k) {
      val next = pts.map(p => (p, sel.map(s => d2(p, s)).min))
        .minBy { case (p, d) => (-d, p._1) }
      sel :+= next._1
      acc :+= ((next._1._1, Some(next._2)))
    }
    acc
  }

  test("square corners first: the four corners cover before any interior point") {
    val corners = Seq((1L, 0L, 0L), (2L, 100L, 0L), (3L, 0L, 100L), (4L, 100L, 100L))
    val interior = (5L to 20L).map(i => (i, 40L + i % 20, 40L + (i * 7) % 20))
    val got = run(corners ++ interior, 4)
    assert(got.map(_._2).toSet === Set(1L, 2L, 3L, 4L))
  }

  test("seed is the min id with NULL radius; radii non-increasing afterwards") {
    val pts = (1L to 30L).map(i => (i, (i * 13) % 97, (i * 29) % 89))
    val got = run(pts, 6)
    assert(got.head === ((0L, 1L, None)))
    val radii = got.tail.map(_._3.get)
    assert(radii === radii.sorted.reverse, s"radii not non-increasing: $radii")
  }

  test("random point sets match the driver-side farthest-first replay") {
    val rnd = new Random(23)
    for (trial <- 1 to 8) {
      val pts = (1L to 40L).map(i =>
        (i, rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
      val want = ref(pts, 5)
      val got = run(pts, 5).map(r => (r._2, r._3))
      assert(got === want, s"trial $trial")
    }
  }
}
