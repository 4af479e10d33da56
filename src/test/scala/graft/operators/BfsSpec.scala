package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** BFS against closed forms: path/star/cycle distances, the hop
  * budget, early exit on an exhausted frontier, unreachable absence,
  * and multi-source minimum. */
class BfsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def undirected(pairs: (Long, Long)*) =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")

  private def run(edges: org.apache.spark.sql.DataFrame, srcs: Seq[Long],
                  hops: Int): Map[Long, Long] = {
    val got = Bfs.hopDistances(edges, srcs.toDF("id"), hops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Checkpoints.clear(spark)
    got
  }

  test("path graph: dist == index, truncated at the hop budget") {
    val e = undirected((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    assert(run(e, Seq(1L), 3) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    // wide budget reaches everything; frontier exhaustion exits early
    assert(run(e, Seq(1L), 100) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L, 6L -> 5L))
  }

  test("cycle: min distance wins in both directions") {
    // 6-cycle from node 1: the far node is 3 away both ways
    val e = undirected((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 1L))
    assert(run(e, Seq(1L), 6) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 2L, 6L -> 1L))
  }

  test("disconnected component is absent; multi-source takes the min") {
    val e = undirected((1L, 2L), (2L, 3L), (10L, 11L))
    val got = run(e, Seq(1L, 11L), 5)
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 11L -> 0L, 10L -> 1L))
    // star: every leaf is 1 from the hub regardless of leaf count
    val star = undirected((1 to 20).map(i => (0L, i.toLong)): _*)
    val g2 = run(star, Seq(0L), 2)
    assert(g2(0L) == 0L && (1 to 20).forall(i => g2(i.toLong) == 1L))
  }
}
