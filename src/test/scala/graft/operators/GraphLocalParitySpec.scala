package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The serving-side local walk ([[Ann.graphSearchLocal]]) must be
  * BIT-IDENTICAL to the distributed-join walk ([[Ann.graphSearch]]
  * via graphTopK) — same sequential-fold dot product, same HALF_UP
  * 6-decimal rounding, same (cos desc, node) tiebreak at every
  * frontier pick and at the final top-k. w30/n31 rest on this parity
  * (they run the local walk against n23's distributed-walk oracle),
  * so it is pinned here across TWO (beam, rounds) settings including
  * the production one. */
class GraphLocalParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("local serving walk equals the distributed walk, both settings") {
    val em = graft.Tables.load(spark, dir, "embeddings")
    val pred = col("vec_id") < 5
    val edges = Ann.knnGraphEdges(em, graft.GateFixtures.rpPlanes, 10)
    val index = Ann.buildLocalGraphIndex(
      em.select(col("vec_id"),
        graft.functions.Similarity.unit(col("embedding")).as("ue")),
      edges)
    val q = em.filter(pred).select(col("vec_id").as("qid"),
      graft.functions.Similarity.unit(col("embedding")).as("qu"))
    for ((beam, rounds) <- Seq((4, 2), (16, 6))) {
      val dist = Ann.graphTopK(em, graft.GateFixtures.rpPlanes, pred,
        m = 10, beam = beam, rounds = rounds, k = 5,
        prebuiltEdges = Some(edges))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val local = Ann.graphSearchLocal(index, q, beam, rounds, 5)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(local == dist,
        s"($beam, $rounds): local walk diverged from distributed walk\n" +
          s"local only: ${local -- dist}\ndist only: ${dist -- local}")
    }
  }
}
