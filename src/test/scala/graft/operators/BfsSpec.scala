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

  test("local and distributed paths agree (round-17 localThreshold)") {
    val rnd = new scala.util.Random(7)
    val n = 30
    val pairs = (0 until 80).map(_ =>
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(p => p._1 != p._2)
    val e = undirected(pairs: _*)
    val srcs = Seq(0L, 7L)
    for (hops <- Seq(0, 1, 3, 6)) {
      val local = Bfs.hopDistances(e, srcs.toDF("id"), hops)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dist = Bfs.hopDistances(e, srcs.toDF("id"), hops,
          localThreshold = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(local === dist, s"hops=$hops")
      Checkpoints.clear(spark)
    }
  }

  // ---- weightedDistances ----

  private def wUndirected(tris: (Long, Long, Long)*) =
    (tris ++ tris.map(t => (t._2, t._1, t._3))).toDF("src", "dst", "w")

  private def runW(edges: org.apache.spark.sql.DataFrame, srcs: Seq[Long],
                   rounds: Int): Map[Long, Long] = {
    val got = Bfs.weightedDistances(edges, srcs.toDF("id"), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Checkpoints.clear(spark)
    got
  }

  test("weighted: the longer-but-cheaper path wins (the case BFS gets wrong)") {
    // 1 -> 4 direct costs 10; 1 -> 2 -> 3 -> 4 costs 3
    val e = wUndirected((1L, 4L, 10L), (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))
    assert(runW(e, Seq(1L), 3) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    // with only 1 relaxation round, the direct edge is the best <=1-edge path
    assert(runW(e, Seq(1L), 1) == Map(1L -> 0L, 2L -> 1L, 4L -> 10L))
  }

  test("weighted: a settled node improves when a later round finds a cheaper path") {
    // 4 is reached at cost 10 in round 1, still 10 after round 2
    // (no <=2-edge path is cheaper), improved to 3 in round 3
    val e = wUndirected((1L, 4L, 10L), (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))
    assert(runW(e, Seq(1L), 2)(4L) == 10L)
    assert(runW(e, Seq(1L), 3)(4L) == 3L)
  }

  test("weighted: local and distributed paths agree (round-17 localThreshold)") {
    val rnd = new scala.util.Random(11)
    val n = 20
    val tris = (0 until 50).map(_ => (rnd.nextInt(n).toLong,
      rnd.nextInt(n).toLong, (1 + rnd.nextInt(9)).toLong))
      .filter(t => t._1 != t._2)
    val e = wUndirected(tris: _*)
    for (rounds <- Seq(0, 1, 4)) {
      val local = Bfs.weightedDistances(e, Seq(0L).toDF("id"), rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dist = Bfs.weightedDistances(e, Seq(0L).toDF("id"), rounds,
          localThreshold = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(local === dist, s"rounds=$rounds")
      Checkpoints.clear(spark)
    }
  }

  test("weighted matches a driver-side Bellman-Ford replay on a random graph") {
    val rnd = new scala.util.Random(3)
    val n = 12
    val tris = (0 until 30).map(_ => (rnd.nextInt(n).toLong,
      rnd.nextInt(n).toLong, (1 + rnd.nextInt(9)).toLong))
      .filter(t => t._1 != t._2)
    val rounds = 5
    val got = runW(wUndirected(tris: _*), Seq(0L), rounds)
    // reference: dense Bellman-Ford over <= rounds edges
    val all = tris ++ tris.map(t => (t._2, t._1, t._3))
    var ref = Map(0L -> 0L)
    for (_ <- 1 to rounds) {
      val relaxed = all.flatMap { case (s, d, w) =>
        ref.get(s).map(c => d -> (c + w))
      }
      ref = (ref.toSeq ++ relaxed).groupBy(_._1)
        .map { case (k, vs) => k -> vs.map(_._2).min }
    }
    assert(got === ref)
  }
}
