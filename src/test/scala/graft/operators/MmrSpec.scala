package graft.operators

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Ann.mmrRerank pinned on the diversity anchor (a near-duplicate of
  * the first pick is deferred behind a less-relevant but diverse
  * candidate), the lambda=1000 degeneration to pure relevance order,
  * and a driver-side greedy replay on random candidate sets. */
class MmrSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def unit(v: Array[Float]): Array[Double] = {
    val n = math.sqrt(v.map(x => x.toDouble * x).sum)
    v.map(_.toDouble / n)
  }

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  /** Independent greedy replay over locally computed rounded sims. */
  private def ref(q: Array[Float], cands: Seq[(Long, Array[Float])], k: Int,
                  lambdaMilli: Int): Seq[Long] = {
    val qu = unit(q)
    val us = cands.map { case (id, v) => id -> unit(v) }.toMap
    val rel = cands.map { case (id, _) => id -> round6(dot(qu, us(id))) }.toMap
    val sim = (for (a <- cands.map(_._1); b <- cands.map(_._1) if a != b)
      yield (a, b) -> round6(dot(us(a), us(b)))).toMap
    val lam = lambdaMilli.toDouble
    val lam2 = (1000 - lambdaMilli).toDouble
    var selected = List.empty[Long]
    var remaining = cands.map(_._1).sorted
    val out = scala.collection.mutable.ListBuffer[Long]()
    while (out.size < k && remaining.nonEmpty) {
      val best = remaining.map { id =>
        val ms = if (selected.isEmpty) 0.0
          else selected.map(p => sim((id, p))).max
        (id, lam * rel(id) - lam2 * ms)
      }.minBy { case (id, s) => (-s, id) }._1
      out += best
      selected ::= best
      remaining = remaining.filterNot(_ == best)
    }
    out.toSeq
  }

  private def run(q: Array[Float], cands: Seq[(Long, Array[Float])], k: Int,
                  lambdaMilli: Int): Seq[Long] = {
    val em = ((0L, q) +: cands).toDF("vec_id", "embedding")
    val candidates = Ann.bruteForceTopK(em, org.apache.spark.sql.functions
      .col("vec_id") === 0L, cands.size)
    Ann.mmrRerank(candidates, em, k, lambdaMilli).collect()
      .sortBy(_.getLong(1)).map(_.getLong(2)).toSeq
  }

  test("a near-duplicate of pick 1 is deferred behind a diverse candidate") {
    // diversity-heavy lambda: the near-copy of pick 1 (sim ~1) pays
    // ~-700 while the near-orthogonal candidate (sim ~0.34) survives
    val q = Array(1.0f, 0.0f)
    val cands = Seq(
      1L -> Array(0.99f, 0.14f),  // most relevant
      2L -> Array(0.99f, 0.141f), // near-duplicate of 1
      3L -> Array(0.2f, 0.98f))   // low relevance, diverse
    assert(run(q, cands, 3, 300) === Seq(1L, 3L, 2L))
    // relevance-heavy lambda keeps the near-duplicate second
    assert(run(q, cands, 3, 900) === Seq(1L, 2L, 3L))
  }

  test("lambda = 1000 degenerates to pure relevance order") {
    val q = Array(1.0f, 0.0f)
    val cands = Seq(
      1L -> Array(0.9f, 0.1f), 2L -> Array(0.9f, 0.11f),
      3L -> Array(0.5f, 0.8f), 4L -> Array(0.3f, 0.9f))
    val byRel = run(q, cands, 4, 1000)
    val topk = Ann.bruteForceTopK(((0L, q) +: cands).toDF("vec_id", "embedding"),
      org.apache.spark.sql.functions.col("vec_id") === 0L, 4)
      .orderBy("rnk").collect().map(_.getAs[Long]("neighbor_id")).toSeq
    assert(byRel === topk)
  }

  test("random candidate sets match the driver-side greedy replay") {
    val rnd = new Random(29)
    for (trial <- 1 to 6) {
      val q = Array.fill(4)(rnd.nextFloat() - 0.5f)
      val cands = (1L to 8L).map(i =>
        i -> Array.fill(4)(rnd.nextFloat() - 0.5f))
      assert(run(q, cands, 4, 700) === ref(q, cands, 4, 700), s"trial $trial")
    }
  }
}
