package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Triangles pinned against a brute-force reference over the node
  * triples, plus the canonicalization guarantees (direction, dupes,
  * self-loops invisible) that make the degree orientation an
  * implementation detail, not a semantic. */
class TrianglesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Brute force: canonical simple graph, then test all triples. */
  private def brute(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val und = edges.collect { case (a, b) if a != b =>
      (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = und.toSeq.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val tris = for {
      i <- nodes.indices; j <- (i + 1) until nodes.size
      k <- (j + 1) until nodes.size
      a = nodes(i); b = nodes(j); c = nodes(k)
      if und((a, b)) && und((a, c)) && und((b, c))
    } yield (a, b, c)
    tris.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Triangles.perNode(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("K4: four triangles, every node in three") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val got = run(k4)
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(got === brute(k4))
  }

  test("triangle-free graphs emit no rows") {
    assert(run(Seq((1L, 2L), (2L, 3L), (3L, 4L))) === Map.empty) // path
    assert(run((1L to 5L).map(i => (i, i % 5 + 1))) === Map.empty) // C5
    assert(run(Seq((1L, 9L), (2L, 9L), (3L, 9L))) === Map.empty) // star
  }

  test("direction, duplicate edges, and self-loops are invisible") {
    val clean = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (1L, 4L))
    val dirty = clean ++ clean.map(_.swap) ++
      Seq((2L, 1L), (2L, 1L), (3L, 3L), (4L, 4L))
    assert(run(dirty) === run(clean))
    assert(run(clean) === brute(clean))
  }

  test("matches brute force on a seeded random graph with a hub") {
    val rnd = new scala.util.Random(42)
    val base = Seq.fill(120)((rnd.nextInt(18).toLong, rnd.nextInt(18).toLong))
    // degree skew: node 0 connects to everyone (the orientation's
    // whole point is that this hub does NOT explode the wedge count)
    val edges = base ++ (1L to 17L).map(i => (0L, i))
    assert(run(edges) === brute(edges))
  }
}
