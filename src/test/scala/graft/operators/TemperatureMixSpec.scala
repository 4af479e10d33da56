package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Temperature allocation (o34) pinned on its two exactness claims:
  * the integer sqrt is EXACT (float-seed correction covers perfect
  * squares and their neighbors, where naive floor(sqrt) goes wrong),
  * and the allocation sums to the budget EXACTLY (largest-remainder
  * closure), for any source mix. */
class TemperatureMixSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mix(counts: Seq[(String, Long)], budget: Long,
                  halvings: Int = 1) =
    Sampling.temperatureMix(counts.toDF("source", "tokens"),
      budget, halvings)
      .orderBy("source")
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(4)))

  test("isqrt is exact on perfect squares and neighbors") {
    val tricky = Seq(0L, 1L, 2L, 3L, 4L, 8L, 9L, 10L, 24L, 25L, 26L,
      (1L << 31) * (1L << 31) - 1, (1L << 31) * (1L << 31),
      999999999999L, 1000000000000L)
    val got = mix(tricky.zipWithIndex.map { case (n, i) => (f"s$i%02d", n) },
      budget = 0L).map(_._2)
    val want = tricky.map(n => math.sqrt(n.toDouble).toLong match {
      case s if (s + 1) * (s + 1) <= n => s + 1
      case s if s * s > n => s - 1
      case s => s
    })
    assert(got.toSeq == want)
  }

  test("allocation sums to the budget exactly, remainder to the " +
    "top-weight source") {
    val counts = Seq(("web", 9999991L), ("code", 123457L),
      ("books", 777L), ("wiki", 31L))
    for (budget <- Seq(0L, 1L, 999L, 5000000L, 999999999L)) {
      val rows = mix(counts, budget)
      assert(rows.map(_._3).sum == budget, s"budget $budget")
      // everyone gets at least the floor share; only the top source
      // carries the remainder
      val top = rows.maxBy(r => (r._2, r._1))._1
      assert(rows.filter(_._1 != top).forall(_._3 >= 0))
    }
    // two halvings = fourth root
    val quad = mix(Seq(("a", 6561L), ("b", 16L)), 100L, halvings = 2)
    assert(quad.find(_._1 == "a").get._2 == 9L)
    assert(quad.find(_._1 == "b").get._2 == 2L)
    assert(quad.map(_._3).sum == 100L)
  }
}
