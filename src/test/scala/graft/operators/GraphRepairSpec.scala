package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Graph-index repair (Ann.bridgeEdges / repairGraphIndex, the n33
  * gate's kernel) pinned on its contract: (1) every node outside the
  * entry's hop horizon gets exactly ONE bridge edge whose source is a
  * reachable anchor at hop <= maxHops-1, chosen by cosine argmax with
  * (cos desc, anchor id) ties — so re-auditing the repaired index
  * finds zero unreachable BY CONSTRUCTION; (2) stored edges pass
  * through untouched (append-only, n25's ingest discipline); (3) on
  * the gate corpus the repaired index's top-rung walk recall is at or
  * above the pre-repair recall (repair must never cost accuracy). */
class GraphRepairSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emOf(vs: (Long, Seq[Double])*) =
    vs.toSeq.toDF("vec_id", "ue")

  test("bridges connect each unreachable node to its cosine-argmax " +
    "anchor within the horizon") {
    // component A: 0 -> 1 -> 2 -> 0 (entry 0); component B: 3 <-> 4;
    // node 5 fully isolated. maxHops=3 -> anchors = hop<=2 = {0,1,2}.
    val em = emOf(
      0L -> Seq(1.0, 0.0), 1L -> Seq(0.6, 0.8), 2L -> Seq(0.0, 1.0),
      3L -> Seq(0.8, 0.6), 4L -> Seq(1.0, 0.0), 5L -> Seq(0.0, 1.0))
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (3L, 4L), (4L, 3L))
      .toDF("src", "dst")
    val reach = Bfs.hopDistances(edges,
      em.filter(col("vec_id") === 0L).select(col("vec_id").as("id")), 3)
    val bridges = Ann.bridgeEdges(em, reach, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // argmax cosines: 3 ~ (0.8,0.6): anchor 1 (0.96 > 0.8 > 0.6);
    // 4 = (1,0): anchor 0 (1.0); 5 = (0,1): anchor 2 (1.0)
    assert(bridges == Set((1L, 3L), (0L, 4L), (2L, 5L)))
    // the repaired graph reaches everything within the horizon
    val repaired = Ann.repairGraphIndex(em, edges, 0L, 3)
    val ids = Bfs.hopDistances(repaired,
      em.filter(col("vec_id") === 0L).select(col("vec_id").as("id")), 3)
      .select("id").as[Long].collect().toSet
    assert(ids == Set(0L, 1L, 2L, 3L, 4L, 5L))
    // and the stored edges passed through untouched
    val kept = repaired.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(Set((0L, 1L), (1L, 2L), (2L, 0L), (3L, 4L), (4L, 3L))
      .subsetOf(kept))
  }

  test("equal cosines tie-break on the smaller anchor id") {
    // anchors 0 and 1 carry the SAME vector; orphan 3 matches both at
    // cos 1.0 — the bridge must come from anchor 0
    val em = emOf(
      0L -> Seq(1.0, 0.0), 1L -> Seq(1.0, 0.0), 3L -> Seq(1.0, 0.0))
    val edges = Seq((0L, 1L)).toDF("src", "dst")
    val reach = Bfs.hopDistances(edges,
      em.filter(col("vec_id") === 0L).select(col("vec_id").as("id")), 2)
    val bridges = Ann.bridgeEdges(em, reach, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bridges == Set((0L, 3L)))
  }

  test("anchors past maxHops-1 are excluded: the bridged node must " +
    "land INSIDE the audit horizon") {
    // chain 0 -> 1 -> 2; orphan 9 is nearest to node 2 — but with
    // maxHops=2, node 2 sits AT the horizon (hop 2) and bridging from
    // it would put 9 at hop 3, still invisible to a 2-hop audit. The
    // bridge must come from the best anchor at hop <= 1.
    val em = emOf(
      0L -> Seq(1.0, 0.0), 1L -> Seq(0.8, 0.6), 2L -> Seq(0.0, 1.0),
      9L -> Seq(0.0, 1.0))
    val edges = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")
    val reach = Bfs.hopDistances(edges,
      em.filter(col("vec_id") === 0L).select(col("vec_id").as("id")), 2)
    val bridges = Ann.bridgeEdges(em, reach, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // cos(9, 2) = 1.0 but 2 is out of the anchor set; cos(9, 1) = 0.6
    // beats cos(9, 0) = 0.0
    assert(bridges == Set((1L, 9L)))
    val repaired = edges.unionByName(Ann.bridgeEdges(em, reach, 2))
    val ids = Bfs.hopDistances(repaired,
      em.filter(col("vec_id") === 0L).select(col("vec_id").as("id")), 2)
      .select("id").as[Long].collect().toSet
    assert(ids.contains(9L), "the bridged node must be inside the horizon")
  }

  test("gate corpus: repair pins zero unreachable and never costs " +
    "top-rung recall") {
    val row = graft.SparkEntry
      .queries("n33_graph_index_repair")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(row.length == 1)
    val r = row.head
    val (before, bridges, after) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val (pre, post) = (r.getLong(3), r.getLong(4))
    assert(bridges == before, "exactly one bridge per unreachable node")
    assert(after == 0L, "the repaired index must have zero unreachable")
    assert(post >= pre,
      s"repair cost recall: pre=$pre post=$post")
  }
}
