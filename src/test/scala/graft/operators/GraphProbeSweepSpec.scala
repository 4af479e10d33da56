package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The gated graph-ANN parameter sweep (n31) pinned on its curve
  * claims: AVERAGE recall across the query set is monotone
  * non-decreasing as (beam, rounds) grow — unlike IVF's nested
  * candidate sets this is a corpus-observed property, not a
  * structural guarantee (a wider beam can wander differently per
  * query), which is exactly why the gate exists: the tuning table is
  * how an operator VERIFIES the ladder before trusting it. The top
  * setting (16, 6) is n23's production configuration, so its per-query
  * rows must equal n23's recall against the same truth. */
class GraphProbeSweepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("gate table: average recall monotone up the ladder; top rung " +
    "equals the production walk's recall") {
    val out = graft.SparkEntry
      .queries("n31_graph_probe_sweep")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5)))
    assert(out.length == 15, "3 settings x 5 queries")
    val avgBySetting = out.groupBy(r => (r._1, r._2)).toSeq.sortBy(_._1)
      .map { case (st, rows) => st -> rows.map(_._4).sum / rows.length }
    assert(avgBySetting.map(_._1) == Seq((4L, 2L), (8L, 4L), (16L, 6L)))
    val avgs = avgBySetting.map(_._2)
    assert(avgs.zip(avgs.tail).forall { case (a, b) => a <= b },
      s"average recall fell up the ladder: $avgBySetting")

    // top rung == n23's walk scored against the same brute-force truth
    import org.apache.spark.sql.functions.col
    val em = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val n23 = graft.SparkEntry
      .queries("n23_ann_graph")(spark, "/root/testdata/sf0.001")
    val expected = Ann.recallAtK(n23,
      Ann.bruteForceTopK(em, col("vec_id") < 5, 5), 5)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val topRung = out.filter(r => r._1 == 16L && r._2 == 6L)
      .map(r => r._3 -> r._4).toMap
    assert(topRung == expected,
      s"top rung $topRung must equal n23's recall $expected")
  }
}
