package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** PageRank pinned against a driver-side reference implementation of
  * the same integer recurrence, plus the structural properties that
  * make the integer formulation engine-portable. */
class PageRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference: same micro-unit floor-division recurrence, in-memory. */
  private def reference(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val inbound = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) / outdeg(s) }.sum).toMap
      r = nodes.map(n => n -> (150000L + 85L * inbound.getOrElse(n, 0L) / 100L)).toMap
    }
    r
  }

  private val diamond: Seq[(Long, Long)] =
    Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 1L))

  test("matches the in-memory reference on a diamond graph, 1-4 iterations") {
    val df = diamond.toDF("src", "dst")
    for (iters <- 1 to 4) {
      val got = PageRank.ranks(df, iters).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === reference(diamond, iters), s"iters=$iters")
    }
  }

  test("a sink node keeps the damping base; a hub accumulates") {
    // star: 1,2,3 -> 4 and nothing else; 4 is a dangling hub
    val star = Seq((1L, 4L), (2L, 4L), (3L, 4L))
    val got = PageRank.ranks(star.toDF("src", "dst"), 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // sources get no inbound mass -> exactly the base both rounds
    assert(got(1L) === 150000L && got(2L) === 150000L && got(3L) === 150000L)
    // round 2: hub gets 3 * (150000 / 1) spokes -> 150000 + 85*450000/100
    assert(got(4L) === 150000L + 85L * 450000L / 100L)
    assert(got === reference(star, 2))
  }

  /** Reference for the personalized recurrence: per-seed 1e6 basis,
    * damping base only on seeds. */
  private def referenceP(edges: Seq[(Long, Long)], seeds: Set[Long],
                         iters: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = nodes.map(n => n -> (if (seeds(n)) 1000000L else 0L)).toMap
    for (_ <- 1 to iters) {
      val inbound = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) / outdeg(s) }.sum).toMap
      r = nodes.map(n => n -> ((if (seeds(n)) 150000L else 0L) +
        85L * inbound.getOrElse(n, 0L) / 100L)).toMap
    }
    r
  }

  test("personalized: matches the in-memory reference; mass confined " +
    "to the seed neighborhood") {
    // path 1 -> 2 -> 3 -> 4 -> 5, seed at node 1 only
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val seeds = Seq(1L).toDF("id")
    for (iters <- 1 to 3) {
      val got = PageRank.personalizedRanks(path.toDF("src", "dst"),
        seeds, iters).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === referenceP(path, Set(1L), iters), s"iters=$iters")
      // nodes beyond `iters` hops from the seed hold EXACTLY zero —
      // the mass-confined-to-the-neighborhood claim the scale
      // argument rests on (no decay-monotonicity claim: the seed
      // itself retains only the 150k base once its initial mass has
      // moved on, so its 1-hop neighbor legitimately outranks it)
      (iters + 2 to 5).foreach(n => assert(got(n.toLong) === 0L,
        s"node $n is ${n - 1} hops out; iters=$iters must not reach it"))
    }
    // a seed absent from the graph contributes nothing
    val gotAbsent = PageRank.personalizedRanks(path.toDF("src", "dst"),
      Seq(99L).toDF("id"), 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotAbsent.values.forall(_ == 0L))
  }

  test("rank is independent of edge-list row order and partitioning") {
    val shuffled = scala.util.Random.shuffle(diamond)
    val a = PageRank.ranks(diamond.toDF("src", "dst").repartition(1), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val b = PageRank.ranks(shuffled.toDF("src", "dst").repartition(7), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(a === b)
  }
}
