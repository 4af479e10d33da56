package graft.operators

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** LabelProp.modularity pinned on textbook closed forms (two clean
  * communities = 0.5; the all-in-one partition = 0; an adversarial
  * cross-cut partition negative) and a driver-side replay on random
  * graphs with random partitions. */
class ModularitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(es: Seq[(Long, Long)], lab: Map[Long, Long]): (Long, Long, Long) = {
    val edges = (es ++ es.map(_.swap)).toDF("src", "dst")
    val labels = lab.toSeq.toDF("node_id", "label")
    val r = LabelProp.modularity(edges, labels).collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  private def refQppm(es: Seq[(Long, Long)], lab: Map[Long, Long]): Long = {
    val m = es.size.toLong
    val byC = lab.values.toSeq.distinct.map { c =>
      val ec = es.count { case (a, b) => lab(a) == c && lab(b) == c }.toLong
      val dc = es.flatMap { case (a, b) => Seq(a, b) }
        .count(lab(_) == c).toLong
      (ec, dc)
    }
    (4 * m * byC.map(_._1).sum - byC.map(x => x._2 * x._2).sum) * 1000000L /
      (4 * m * m)
  }

  private val twoTriangles =
    Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 4L -> 5L, 5L -> 6L, 6L -> 4L)

  test("two clean communities: Q = 0.5 exactly") {
    val lab = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 4L)
    assert(run(twoTriangles, lab) === ((6L, 2L, 500000L)))
  }

  test("everything in one community: Q = 0") {
    val lab = (1L to 6L).map(_ -> 0L).toMap
    assert(run(twoTriangles, lab)._3 === 0L)
  }

  test("adversarial cross-cut partition: Q negative") {
    // K2,2 split along its sides: zero intra edges
    val es = Seq(1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L)
    val lab = Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L)
    val (_, _, q) = run(es, lab)
    assert(q === -500000L)
  }

  test("random graphs + random partitions match the driver replay") {
    val rnd = new Random(17)
    for (trial <- 1 to 10) {
      val n = 15
      val es = Seq.fill(25)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      val lab = (0L until n.toLong).map(v => v -> rnd.nextInt(3).toLong).toMap
      val got = run(es, lab.filter { case (v, _) =>
        es.exists(e => e._1 == v || e._2 == v) })
      assert(got._3 === refQppm(es, lab), s"trial $trial")
      assert(got._1 === es.size.toLong)
    }
  }
}
