package graft.operators

import org.apache.spark.sql.execution.SparkPlan
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** SpatialJoin pinned on two claims: (1) the grid-blocked join equals
  * the brute-force all-pairs radius join for any point set (cell
  * blocking is pure pruning — 3x3 neighborhoods cover every pair
  * within the radius, and the single-matching-replica argument means
  * no pair is double-emitted); (2) the executed plan contains no
  * cartesian product — the whole point of the operator. */
class SpatialJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def brute(pts: Seq[(Long, Long, Long)], r: Long): Set[(Long, Long, Long)] =
    (for {
      (ka, xa, ya) <- pts; (kb, xb, yb) <- pts if ka != kb
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
      if d2 <= r * r
    } yield (ka, kb, d2)).toSet

  private def run(pts: Seq[(Long, Long, Long)], r: Long): Seq[(Long, Long, Long)] =
    SpatialJoin.radiusJoin(pts.toDF("k", "x", "y"), "k", "x", "y", r)
      .collect().toSeq.map(row => (row.getLong(0), row.getLong(1), row.getLong(2)))

  test("hand grid: pairs across cell boundaries are found, distant pairs are not") {
    // points straddling cell boundaries for r=5 (cells of side 5):
    // (4,4) and (6,6) sit in different cells but d2 = 8 <= 25.
    val pts = Seq((1L, 4L, 4L), (2L, 6L, 6L), (3L, 0L, 0L), (4L, 30L, 30L),
      (5L, 30L, 34L), (6L, 9L, 0L))
    val got = run(pts, 5L)
    assert(got.toSet === brute(pts, 5L))
    // no duplicate emission: one row per ordered pair
    assert(got.size === got.toSet.size)
    val pairs = got.map(t => (t._1, t._2)).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 1L))) // cross-cell
    assert(pairs.contains((4L, 5L))) // same column, d2 = 16
    assert(!pairs.exists(p => p._1 == 3L && p._2 == 4L)) // far apart
  }

  test("random point set equals brute force (boundary d2 == r^2 included)") {
    val rnd = new scala.util.Random(42)
    val pts = (1L to 120L).map(i =>
      (i, rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    // duplicate coordinates (d2 = 0) and exact-radius pairs both occur
    val got = run(pts, 4L)
    assert(got.toSet === brute(pts, 4L))
    assert(got.size === got.toSet.size)
  }

  test("executed plan has no cartesian product and no broadcast NL join") {
    val pts = (1L to 50L).map(i => (i, i % 13, i % 7))
    val df = SpatialJoin.radiusJoin(pts.toDF("k", "x", "y"), "k", "x", "y", 3L)
    df.collect()
    def nodes(p: SparkPlan): Seq[String] =
      p.getClass.getSimpleName +: p.children.flatMap(nodes)
    val all = nodes(df.queryExecution.executedPlan).mkString(",")
    assert(!all.contains("CartesianProduct"), all)
    assert(!all.contains("BroadcastNestedLoopJoin"), all)
  }
}
