package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** SetSimJoin pinned on the prefix filter's COMPLETENESS: the result
  * must equal a brute-force all-pairs Jaccard join for any corpus and
  * any tau — the filter may only ever remove pairs that cannot reach
  * the threshold. */
class SetSimJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sh(text: String, k: Int): Set[String] =
    text.split(" ").toSeq.sliding(k).filter(_.size == k)
      .map(_.mkString(" ")).toSet

  /** Brute force over all doc pairs, same integer accept test. */
  private def brute(docs: Seq[(Long, String)], k: Int, tauNum: Int,
                    tauDen: Int): Set[(Long, Long, Long, Long)] = {
    val sets = docs.map { case (id, t) => id -> sh(t, k) }
      .filter(_._2.nonEmpty)
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size.toLong
      union = sa.size + sb.size - inter
      if inter * tauDen >= union * tauNum
    } yield (a, b, inter, union)).toSet
  }

  private def run(docs: Seq[(Long, String)], k: Int, tauNum: Int,
                  tauDen: Int): Set[(Long, Long, Long, Long)] =
    SetSimJoin.jaccardSelfJoin(docs.toDF("doc_id", "text"), k, tauNum, tauDen)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  private val corpus = Seq(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "the quick brown fox jumps over the lazy cat", // near-dup of 1
    3L -> "the quick brown fox jumps over the lazy dog", // exact dup of 1
    4L -> "pack my box with five dozen liquor jugs",
    5L -> "entirely different words here altogether now again today")

  test("hand corpus: near-dup and exact-dup pairs, nothing else") {
    val got = run(corpus, 3, 1, 2)
    assert(got === brute(corpus, 3, 1, 2))
    val pairs = got.map(t => (t._1, t._2))
    assert(pairs.contains((1L, 3L))) // exact dup
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 3L))) // near dups
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L || p._2 == 5L))
    // exact dup scores jaccard 1: inter == union
    val d13 = got.find(t => (t._1, t._2) == ((1L, 3L))).get
    assert(d13._3 === d13._4)
  }

  test("tau = 1 keeps only identical shingle sets") {
    val got = run(corpus, 3, 1, 1)
    assert(got.map(t => (t._1, t._2)) === Set((1L, 3L)))
    assert(got === brute(corpus, 3, 1, 1))
  }

  test("docs shorter than k words are excluded, not fatal") {
    val docs = corpus ++ Seq(6L -> "too short", 7L -> "")
    assert(run(docs, 3, 1, 2) === brute(docs, 3, 1, 2))
  }

  test("completeness vs brute force on seeded random corpora, three taus") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    // tiny vocab forces heavy token sharing — the regime where an
    // unsound prefix bound would actually drop qualifying pairs
    val docs = (1L to 40L).map { id =>
      id -> Seq.fill(4 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    }
    for ((tn, td) <- Seq((1, 2), (3, 10), (4, 5)))
      assert(run(docs, 2, tn, td) === brute(docs, 2, tn, td),
        s"tau=$tn/$td")
  }

  // ---- containment (the asymmetric measure) ----

  private def bruteContain(docs: Seq[(Long, String)], k: Int, tauNum: Int,
                           tauDen: Int): Set[(Long, Long, Long, Long)] = {
    val sets = docs.map { case (id, t) => id -> sh(t, k) }
      .filter(_._2.nonEmpty)
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a != b
      inter = (sa & sb).size.toLong
      if inter * tauDen >= sa.size.toLong * tauNum
    } yield (a, b, inter, sa.size.toLong)).toSet
  }

  private def runContain(docs: Seq[(Long, String)], k: Int, tauNum: Int,
                         tauDen: Int): Set[(Long, Long, Long, Long)] =
    SetSimJoin.containmentSelfJoin(docs.toDF("doc_id", "text"), k, tauNum, tauDen)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("containment is asymmetric: the excerpt hits, the container doesn't") {
    // doc 11 is a verbatim excerpt of doc 10 (full containment) but a
    // tiny Jaccard fraction of it — the case resemblance misses
    val big = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq(10L -> big,
      11L -> (5 to 12).map(i => s"w$i").mkString(" "),
      12L -> "x1 x2 x3 x4 x5")
    val got = runContain(docs, 2, 9, 10)
    assert(got.map(t => (t._1, t._2)) == Set((11L, 10L)))
    // and the symmetric Jaccard join at any meaningful tau finds nothing
    assert(run(docs, 2, 3, 10).isEmpty)
    assert(got == bruteContain(docs, 2, 9, 10))
  }

  test("containment completeness vs brute force, heavy-sharing corpus") {
    val rnd = new scala.util.Random(23)
    val vocab = Vector("a", "b", "c", "d", "e")
    val docs = (1L to 35L).map { id =>
      id -> Seq.fill(3 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    }
    for ((tn, td) <- Seq((1, 2), (8, 10), (1, 1)))
      assert(runContain(docs, 2, tn, td) === bruteContain(docs, 2, tn, td),
        s"tau=$tn/$td")
  }
}
