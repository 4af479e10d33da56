package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.Similarity

/** Negative-control pin for d16's CELL-BOUNDARY semantics: semantic
  * dedup is k-means cell blocking + in-cell pairwise, so a near-dup
  * pair whose members are assigned to DIFFERENT cells is — by design —
  * not reported. This spec pins both halves of that contract on a
  * hand-built corpus: no in-cell pair above threshold is ever missed
  * (operator == brute-force within-cell reference), and the straddling
  * pair is provably absent (the documented approximation, the price of
  * never running corpus² — SCALE.md d16). */
class SemanticDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // axis-aligned 2D codebook in the long (cluster, pos, c) form
  private def centroids = Seq(
    (0, 0, 1.0), (0, 1, 0.0),
    (1, 0, 0.0), (1, 1, 1.0)).toDF("cluster", "pos", "c")

  // v1/v2: same cell (x-axis), cosine ~1       -> pair REPORTED
  // v3/v4: cosine ~0.998 but v3 leans x, v4 leans y -> cells differ,
  //        pair NOT reported (the blocking approximation)
  // v5: y-cell, far from everything at the 0.95 threshold
  private val vecs = Seq(
    (1L, Seq(1.00, 0.01)),
    (2L, Seq(1.00, 0.02)),
    (3L, Seq(0.72, 0.69)),
    (4L, Seq(0.69, 0.72)),
    (5L, Seq(0.10, 1.00)))

  test("no in-cell pair above threshold is missed; straddling pairs are absent") {
    val em = vecs.toDF("vec_id", "embedding")
    val threshold = 0.95

    val got = Dedup.semanticDedup(em, centroids, threshold)
      .select("drop_id", "cluster", "n_conflicts").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

    // independent reference: assignment by max-cosine centroid, then
    // ALL within-cell pairs >= threshold, drop = higher id
    val unit = vecs.map { case (id, v) =>
      val n = math.sqrt(v.map(x => x * x).sum)
      id -> v.map(_ / n)
    }.toMap
    def cos(a: Long, b: Long) =
      BigDecimal(unit(a).zip(unit(b)).map { case (x, y) => x * y }.sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val cell = vecs.map { case (id, _) =>
      id -> (if (unit(id)(0) >= unit(id)(1)) 0 else 1)
    }.toMap
    val expected = (for {
      (a, _) <- vecs; (b, _) <- vecs
      if a > b && cell(a) == cell(b) && cos(a, b) >= threshold
    } yield (a, cell(a))).groupBy(identity)
      .map { case ((id, c), xs) => (id, c, xs.size.toLong) }.toSet

    assert(got == expected)
    // the in-cell near-dup IS caught...
    assert(got.exists(_._1 == 2L))
    // ...and the straddling near-dup pair (3,4) is absent BY DESIGN,
    // even though its cosine clears the threshold
    assert(cos(4L, 3L) >= threshold)
    assert(cell(3L) != cell(4L))
    assert(!got.exists(g => g._1 == 3L || g._1 == 4L))
  }

  test("assignment boundary: a tie goes to the lower cluster id deterministically") {
    // exactly on the diagonal: cosine to both centroids is equal; the
    // argmax window orders by (score desc, cluster), so cluster 0 wins
    // — boundary assignment is deterministic, not partition-dependent
    val em = Seq((7L, Seq(1.0, 1.0))).toDF("vec_id", "embedding")
    val cellOf = Ann.clusterAssignment(em, centroids)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cellOf(7L) == 0)
  }
}
