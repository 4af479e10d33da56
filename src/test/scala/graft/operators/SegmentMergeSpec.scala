package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Segment merge (n35) pinned on its two structural contracts: the
  * segment edge lists pass through BIT-FOR-BIT (frozen-segment — the
  * merge never re-scores history), and every NEW edge is a
  * cross-segment stitch within the per-node cap. */
class SegmentMergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val planes = Ann.randomHyperplanes(8, 8)

  private def corpus(n: Int) =
    (0 until n).map { i =>
      val v = Array.tabulate(8)(d =>
        math.sin(i * 31 + d * 7) + (if (d == i % 8) 2.0 else 0.0))
      (i.toLong, v)
    }.toDF("vec_id", "embedding")

  test("segment edges pass through bit-for-bit; new edges are " +
    "cross-segment only, capped per node") {
    val em = corpus(60)
    val segA = Ann.knnGraphEdges(em.filter(col("vec_id") % 2 === 0),
      planes, m = 4, refineRounds = 1)
    val segB = Ann.knnGraphEdges(em.filter(col("vec_id") % 2 === 1),
      planes, m = 4, refineRounds = 1)
    val mStitch = 3
    val merged = Ann.mergeSegmentIndexes(em, Seq(segA, segB),
      (a, b) => (a % 2) =!= (b % 2), planes, mStitch)

    val segSet = (segA.select("src", "dst").collect() ++
      segB.select("src", "dst").collect())
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val mergedRows = merged.select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1)))

    // pass-through: every segment edge present, and every
    // intra-segment merged edge came from a segment
    assert(segSet.subsetOf(mergedRows.toSet))
    val intra = mergedRows.filter { case (s, d) => s % 2 == d % 2 }
    assert(intra.toSet == segSet)

    // new edges: cross-segment only, at most mStitch per src
    val stitch = mergedRows.filterNot(segSet)
    assert(stitch.nonEmpty)
    assert(stitch.forall { case (s, d) => s % 2 != d % 2 })
    val perSrc = stitch.groupBy(_._1).map(_._2.length)
    assert(perSrc.forall(_ <= mStitch))
  }
}
