package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** AsOfJoin.nearest pinned on its decision algebra: direction choice
  * by exact distance, the tie rules (equal distance → backward;
  * equal-ts right rows → max id backward / min id forward), edge
  * partitions with rights on only one side, and the null-key rule. */
class NearestJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(left: Seq[(Long, Long, Long)],
                  right: Seq[(Long, Long, Long)],
                  inner: Boolean = true): Map[Long, (Any, Any)] = {
    val l = left.toDF("k", "lid", "lts")
    val r = right.toDF("k", "rid", "rts")
    AsOfJoin.nearest(l, r, Seq("k"), "lts", "rts", "rid",
        Seq("rid" -> "match_id"), inner)
      .collect().map(row => row.getLong(1) ->
        ((row.get(3), row.get(4)))).toMap  // lid -> (match_id, delta)
  }

  test("picks the closer side; signed delta") {
    // left at 100; rights at 80 (d=20) and 150 (d=50) → backward
    // left at 200; rights at 150 (d=50) and 210 (d=10) → forward
    val got = run(Seq((1L, 10L, 100L), (1L, 11L, 200L)),
      Seq((1L, 7L, 80L), (1L, 8L, 150L), (1L, 9L, 210L)))
    assert(got(10L) == ((7L, -20L)))
    assert(got(11L) == ((9L, 10L)))
  }

  test("equal distance goes backward") {
    val got = run(Seq((1L, 10L, 100L)), Seq((1L, 1L, 90L), (1L, 2L, 110L)))
    assert(got(10L) == ((1L, -10L)))
  }

  test("right row at the exact left ts matches at distance 0") {
    val got = run(Seq((1L, 10L, 100L)), Seq((1L, 1L, 100L), (1L, 2L, 101L)))
    assert(got(10L) == ((1L, 0L)))
  }

  test("equal-ts rights: backward takes max id, forward takes min id") {
    // both rights at 90 (backward): pick rid 5 (max)
    val b = run(Seq((1L, 10L, 100L)), Seq((1L, 3L, 90L), (1L, 5L, 90L)))
    assert(b(10L) == ((5L, -10L)))
    // both rights at 110 (forward): pick rid 3 (min)
    val f = run(Seq((1L, 10L, 100L)), Seq((1L, 3L, 110L), (1L, 5L, 110L)))
    assert(f(10L) == ((3L, 10L)))
  }

  test("only-backward and only-forward partitions still match") {
    val got = run(Seq((1L, 10L, 100L), (2L, 20L, 100L)),
      Seq((1L, 1L, 10L), (2L, 2L, 900L)))
    assert(got(10L) == ((1L, -90L)))
    assert(got(20L) == ((2L, 800L)))
  }

  test("inner drops matchless lefts; left-form keeps them with nulls") {
    val left = Seq((1L, 10L, 100L), (2L, 20L, 100L))
    val right = Seq((1L, 1L, 50L))
    assert(!run(left, right).contains(20L))
    val outer = run(left, right, inner = false)
    assert(outer(20L) == ((null, null)))
  }

  test("null keys never match") {
    val l = Seq((Some(1L), 10L, 100L), (None, 20L, 100L))
      .toDF("k", "lid", "lts")
    val r = Seq((Some(1L), 1L, 90L), (None, 2L, 99L)).toDF("k", "rid", "rts")
    val got = AsOfJoin.nearest(l, r, Seq("k"), "lts", "rts", "rid",
        Seq("rid" -> "match_id"), inner = false)
      .collect().map(row => row.getLong(1) -> row.get(3)).toMap
    assert(got(10L) == 1L)
    assert(got(20L) == null)
  }

  test("matches a brute-force reference on a random workload") {
    val left = (1L to 40L).map(i => (i % 4, i, (i * 37) % 500))
    val right = (1L to 25L).map(j => (j % 4, 100 + j, (j * 73) % 500))
    val got = run(left, right)
    left.foreach { case (k, lid, lts) =>
      val cands = right.filter(_._1 == k)
      if (cands.isEmpty) assert(!got.contains(lid))
      else {
        val best = cands.minBy { case (_, rid, rts) =>
          val d = math.abs(rts - lts)
          val fwd = if (rts <= lts) 0 else 1
          (d, fwd, if (fwd == 0) -rid else rid)
        }
        assert(got(lid) == ((best._2, best._3 - lts)), s"left $lid")
      }
    }
  }
}
