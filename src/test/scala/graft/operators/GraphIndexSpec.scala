package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{GateFixtures, Tables, TestSpark}

/** Pins the kNN-graph index family's contracts (n23 build / n25
  * incremental maintenance): append-only stored edges, batch edges
  * from the banded probe only, bounded degree, and cross-split
  * reachability (the property the search actually needs). */
class GraphIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"
  private def em = Tables.load(spark, dir, "embeddings")

  test("graphTopK over a PREBUILT index equals the inline build (the n23 split)") {
    // the round-13 gate reads the memoized persisted index; search
    // results must be bit-identical to the build-inline form, or the
    // split would silently change what n23's oracle verifies
    def rows(r: org.apache.spark.sql.DataFrame) =
      r.collect().map(x =>
        (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3))).toSet
    val edges = Ann.knnGraphEdges(em, GateFixtures.rpPlanes, 10)
    val inline = rows(Ann.graphTopK(em, GateFixtures.rpPlanes,
      col("vec_id") < 5, m = 10, beam = 16, rounds = 6, k = 5))
    val split = rows(Ann.graphTopK(em, GateFixtures.rpPlanes,
      col("vec_id") < 5, m = 10, beam = 16, rounds = 6, k = 5,
      prebuiltEdges = Some(edges)))
    assert(split == inline)
  }

  test("incremental maintenance: stored edge lists pass through bit-for-bit") {
    val stored = Ann.knnGraphEdges(em.filter(col("vec_id") % 4 =!= 0),
      GateFixtures.rpPlanes, 10)
    val storedRows = stored.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val out = Ann.incrementalGraphEdges(stored, em,
      col("vec_id") % 4 === 0, GateFixtures.rpPlanes, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val outStored = out.filter(_._1 % 4 != 0)
    assert(outStored == storedRows,
      "stored nodes' edges must pass through unchanged (append-only contract)")
  }

  test("incremental maintenance: batch nodes get bounded-degree edges incl. cross-split") {
    val stored = Ann.knnGraphEdges(em.filter(col("vec_id") % 4 =!= 0),
      GateFixtures.rpPlanes, 10)
    val out = Ann.incrementalGraphEdges(stored, em,
      col("vec_id") % 4 === 0, GateFixtures.rpPlanes, 10)
    val batch = out.filter(col("src") % 4 === 0)
    val degrees = batch.groupBy("src").count().collect().map(_.getLong(1))
    assert(degrees.nonEmpty && degrees.forall(_ <= 10),
      s"batch out-degree must be in 1..m, got max ${degrees.max}")
    // the property the search needs: batch nodes connect INTO the
    // stored graph (an isolated batch island would be unreachable)
    assert(batch.filter(col("dst") % 4 =!= 0).count() > 0,
      "no batch->stored edges: the batch is an island")
  }

  test("batch edges are the exact top-m cosine picks among band collisions") {
    // independent replay for every batch src: candidates from the
    // banded signature join over the FULL corpus, ranked by
    // (rounded cosine desc, dst) — the incremental path must equal it
    import graft.functions.Similarity
    val planes = GateFixtures.rpPlanes
    val unit = em.select(col("vec_id"),
      Similarity.unit(col("embedding")).as("ue"))
    val vecs = unit.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def sig(v: Array[Double]): Int = planes.zipWithIndex.map { case (p, j) =>
      val d = p.zip(v).map { case (a, b) => a * b }.sum
      if (d >= 0) 1 << j else 0
    }.sum
    val sigs = vecs.map { case (id, v) => id -> sig(v) }
    val half = 1 << (planes.size / 2)
    def bands(s: Int) = Seq((0, s / half), (1, s % half))
    val byBand = sigs.toSeq.flatMap { case (id, s) =>
      bands(s).map(b => b -> id) }.groupBy(_._1).map { case (b, xs) =>
      b -> xs.map(_._2) }
    def cos(a: Long, b: Long): Double = {
      val (x, y) = (vecs(a), vecs(b))
      val d = x.indices.map(i => x(i) * y(i)).sum
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val stored = Ann.knnGraphEdges(em.filter(col("vec_id") % 4 =!= 0),
      planes, 10)
    val got = Ann.incrementalGraphEdges(stored, em,
      col("vec_id") % 4 === 0, planes, 10)
      .filter(col("src") % 4 === 0).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).toSet }
    // band-bucket cap never trips on this fixture (500 nodes / 16
    // values per band), so the replay skips it
    for (src <- sigs.keys.filter(_ % 4 == 0)) {
      val cands = bands(sigs(src)).flatMap(byBand.getOrElse(_, Nil))
        .distinct.filter(_ != src)
      val want = cands.map(d => (cos(src, d), d))
        .sortBy { case (c, d) => (-c, d) }.take(10).map(_._2).toSet
      assert(got.getOrElse(src, Set.empty) == want, s"src $src edges")
    }
  }
}
