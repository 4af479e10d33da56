package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** SeriesStats.autocorr against an independent driver-side integer
  * replay, plus the semantic anchors: alternating series -> strong
  * negative lag-1, trend -> strong positive lag-1, period-7 signal ->
  * strong lag-7, constant series -> NULL (undefined, not 0). */
class SeriesStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(xs: Seq[Long], lags: Seq[Int]): Map[Long, (Long, Long, Long, Option[Long])] = {
    val df = xs.zipWithIndex.map { case (x, t) => (t.toLong, x) }.toDF("t", "x")
    SeriesStats.autocorr(df, "t", "x", lags).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.getAs[java.lang.Long]("r_ppm")).map(_.toLong)))
    }.toMap
  }

  private def ref(xs: Seq[Long], k: Int): (Long, Long, Option[Long]) = {
    val n = xs.size.toLong
    val s = xs.sum
    val c = xs.map(x => n * x - s)
    val den = c.map(v => v * v).sum
    val num = c.drop(k).zip(c).map { case (a, b) => a * b }.sum
    (num, den, if (den == 0) None else Some(num * 1000000L / den))
  }

  test("matches the driver-side integer replay on an arbitrary series") {
    val xs = Seq(3L, 7L, 2L, 9L, 4L, 4L, 8L, 1L, 6L, 5L, 5L, 2L)
    val got = run(xs, Seq(1, 2, 3))
    for (k <- Seq(1, 2, 3)) {
      val (num, den, r) = ref(xs, k)
      assert(got(k.toLong) === ((xs.size.toLong, num, den, r)), s"lag $k")
    }
  }

  test("alternating series: lag-1 strongly negative, lag-2 strongly positive") {
    val xs = (0 until 40).map(i => if (i % 2 == 0) 10L else 0L)
    val got = run(xs, Seq(1, 2))
    assert(got(1L)._4.get < -900000L)
    assert(got(2L)._4.get > 900000L)
  }

  test("linear trend: lag-1 near +1e6") {
    val xs = (0 until 50).map(_.toLong)
    assert(run(xs, Seq(1))(1L)._4.get > 900000L)
  }

  test("period-7 signal: lag-7 beats lag-3") {
    val xs = (0 until 70).map(i => (i % 7).toLong * 4 + 10)
    val got = run(xs, Seq(3, 7))
    assert(got(7L)._4.get >= 850000L)
    assert(got(3L)._4.get < got(7L)._4.get)
  }

  test("constant series: undefined (NULL), not zero") {
    val got = run(Seq.fill(10)(5L), Seq(1))
    assert(got(1L)._4 === None)
    assert(got(1L)._3 === 0L) // den
  }

  test("lag >= n: zero terms -> num 0") {
    val got = run(Seq(1L, 5L), Seq(3))
    assert(got(3L)._2 === 0L)
  }
}
