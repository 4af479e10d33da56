package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Degree assortativity (GraphStats.degreeAssortativity, the g59
  * gate) pinned on closed-form graphs: a star is exactly −1 (pure
  * hub-to-leaf mixing), and a 2-edge path replays its hand-computed
  * integer moments end to end. (Regular graphs, where every degree
  * is equal and the correlation is undefined with den = 0, are not
  * meaningful inputs — the trade graph is never regular.) Exact
  * integer moments; r is one double division. */
class GraphStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sym(pairs: (Long, Long)*) =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")

  test("star K1,3 is exactly -1") {
    val r = GraphStats.degreeAssortativity(
      sym((0L, 1L), (0L, 2L), (0L, 3L))).collect()(0)
    // m=6, sxy=6*3, sx=3*3+3*1=12, sxx=3*9+3*1=30
    assert(r.getLong(0) == 6L && r.getLong(1) == 18L &&
      r.getLong(2) == 12L && r.getLong(3) == 30L)
    assert(r.getLong(4) == -36L && r.getLong(5) == 36L)
    assert(r.getDouble(6) == -1.0)
  }

  test("clustering coefficient: K3 is exactly 1e6 ppm, P3 is 0") {
    val k3 = GraphStats.clusteringCoefficient(
      sym((0L, 1L), (1L, 2L), (0L, 2L))).collect()(0)
    // 3 nodes, 3 edges, 1 triangle, 3 wedges -> C = 3*1/3 = 1
    assert((k3.getLong(0), k3.getLong(1), k3.getLong(2), k3.getLong(3),
      k3.getLong(4)) == ((3L, 3L, 1L, 3L, 1000000L)))
    val p3 = GraphStats.clusteringCoefficient(
      sym((0L, 1L), (1L, 2L))).collect()(0)
    assert(p3.getLong(2) == 0L && p3.getLong(3) == 1L &&
      p3.getLong(4) == 0L)
  }

  test("path P3 moments are the hand values") {
    // 0-1-2: degrees 1,2,1; directed edges (0,1)(1,0)(1,2)(2,1)
    // dx per edge: 1,2,2,1 ; dy: 2,1,1,2
    // m=4, sxy=4*2=8, sx=6, sxx=1+4+4+1=10
    val r = GraphStats.degreeAssortativity(
      sym((0L, 1L), (1L, 2L))).collect()(0)
    assert(r.getLong(0) == 4L && r.getLong(1) == 8L &&
      r.getLong(2) == 6L && r.getLong(3) == 10L)
    // num = 32-36 = -4, den = 40-36 = 4, r = -1 (path of length 2 is
    // a star K1,2 — every edge joins the hub to a leaf)
    assert(r.getLong(4) == -4L && r.getLong(5) == 4L)
    assert(r.getDouble(6) == -1.0)
  }
}
