package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Retrieval pinned three ways: bm25TopK against a driver-side
  * integer reference (the exact same rational arithmetic, so equality
  * is bitwise), the ranking semantics BM25 exists for (idf: rare
  * beats common; length normalization: short beats long at equal tf),
  * and rrfFuse against hand-computed nano contributions. */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Driver-side reference: identical integer formula, Long floor
    * division (operands all positive). */
  private def refBm25(docs: Seq[(Long, String)],
                      queries: Seq[(Long, Seq[String])],
                      k: Int): Seq[(Long, Long, Long, Long, Long)] = {
    val words = docs.map { case (id, t) => id -> t.split(" ").toSeq }
    val n = words.size.toLong
    val total = words.map(_._2.size.toLong).sum
    val tf: Map[(Long, String), Long] = words.flatMap { case (id, ws) =>
      ws.groupBy(identity).map { case (w, o) => (id, w) -> o.size.toLong }
    }.toMap
    val df: Map[String, Long] =
      tf.keys.groupBy(_._2).map { case (w, ks) => w -> ks.size.toLong }
    val dl: Map[Long, Long] = words.map { case (id, ws) => id -> ws.size.toLong }.toMap
    queries.flatMap { case (qid, qws) =>
      val scored = docs.map(_._1).flatMap { did =>
        val hits = qws.distinct.flatMap { w =>
          tf.get((did, w)).map { t =>
            val num = (2 * n - 2 * df(w) + 1) * (22 * t * total) * 1000
            val den = (2 * df(w) + 1) * (10 * total * t + 3 * total + 9 * dl(did) * n)
            num / den
          }
        }
        if (hits.isEmpty) None
        else Some((did, hits.size.toLong, hits.sum))
      }
      scored.sortBy { case (did, _, s) => (-s, did) }.take(k).zipWithIndex.map {
        case ((did, nt, s), i) => (qid, i + 1L, did, nt, s)
      }
    }
  }

  private val corpus = Seq(
    1L -> "apple banana cherry apple",
    2L -> "apple banana banana date elderberry fig grape",
    3L -> "cherry date cherry date cherry",
    4L -> "apple apple apple apple apple apple apple apple apple apple",
    5L -> "zebra yak xylophone walrus")

  test("bm25TopK equals the driver-side integer reference") {
    val queries = Seq(10L -> Seq("apple", "cherry"), 11L -> Seq("zebra"),
      12L -> Seq("banana", "banana", "date"))
    val qt = queries.flatMap { case (q, ws) => ws.map(q -> _) }
      .toDF("query_id", "word")
    val got = Retrieval.bm25TopK(corpus.toDF("doc_id", "text"), qt, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq.sorted
    assert(got == refBm25(corpus, queries, 3).sorted)
  }

  test("idf: at equal tf and dl, the rarer term outranks the common one") {
    // 'rare' in 1 doc, 'common' in 4; probe docs identical otherwise.
    val docs = Seq(1L -> "rare pad pad", 2L -> "common pad pad",
      3L -> "common x y", 4L -> "common p q", 5L -> "common r s")
    val qt = Seq((1L, "rare"), (2L, "common")).toDF("query_id", "word")
    val byQ = Retrieval.bm25TopK(docs.toDF("doc_id", "text"), qt, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(byQ(1L) > byQ(2L))
  }

  test("length normalization: equal tf scores higher in the shorter doc") {
    val docs = Seq(1L -> "term a", 2L -> "term a b c d e f g h i j k")
    val qt = Seq((1L, "term")).toDF("query_id", "word")
    val got = Retrieval.bm25TopK(docs.toDF("doc_id", "text"), qt, 2)
      .collect().map(r => r.getLong(2) -> r.getLong(4)).toMap
    assert(got(1L) > got(2L))
  }

  test("repeated query terms count once") {
    val docs = Seq(1L -> "a b c", 2L -> "a x y")
    val once = Seq((1L, "a")).toDF("query_id", "word")
    val thrice = Seq((1L, "a"), (1L, "a"), (1L, "a")).toDF("query_id", "word")
    val a = Retrieval.bm25TopK(docs.toDF("doc_id", "text"), once, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4))).toSet
    val b = Retrieval.bm25TopK(docs.toDF("doc_id", "text"), thrice, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4))).toSet
    assert(a == b)
  }

  test("rrfFuse: hand-computed nano contributions and rank order") {
    // q1: doc 7 is rank 1 in BOTH lists; doc 8 rank 2 lexical only;
    // doc 9 rank 2 dense only. 7 must win with 2 contributions.
    val lex = Seq((1L, 7L, 1L), (1L, 8L, 2L)).toDF("query_id", "doc_id", "rnk")
    val den = Seq((1L, 7L, 1L), (1L, 9L, 2L)).toDF("query_id", "doc_id", "rnk")
    val got = Retrieval.rrfFuse(lex, den, 10)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    val c1 = 1000000000L / 61   // rank 1
    val c2 = 1000000000L / 62   // rank 2
    assert(got.toSeq == Seq((1L, 7L, 2L, 2 * c1), (2L, 8L, 1L, c2),
      (3L, 9L, 1L, c2)))
    // tie between 8 and 9 (equal fused score) broken by doc_id: 8 first.
    assert(got.map(_._2).toSeq == Seq(7L, 8L, 9L))
  }

  test("bm25 plan: query probe is broadcast — corpus never shuffles on the query join") {
    val qt = Seq((1L, "apple")).toDF("query_id", "word")
    val plan = Retrieval.bm25TopK(corpus.toDF("doc_id", "text"), qt, 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"))
  }

  // ---- textRank ----

  test("textRank == PageRank.ranks over the hand-built adjacency graph") {
    val docs = Seq("alpha beta gamma", "beta alpha", "gamma delta alpha")
      .toDF("text")
    // distinct content bigrams (len >= 4, a != b), mirrored
    val pairs = Seq(("alpha", "beta"), ("beta", "gamma"), ("beta", "alpha"),
      ("gamma", "delta"), ("delta", "alpha"))
    val edges = (pairs ++ pairs.map(_.swap)).distinct.toDF("src", "dst")
    val expected = PageRank.ranks(edges, 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Retrieval.textRank(docs, "text", 3, minLen = 4, topK = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("textRank: short words and self-pairs are filtered out") {
    val docs = Seq("aa bb aa", "word word", "only solo").toDF("text")
    // aa/bb too short; word-word is a self-pair; only-solo is the one edge
    val got = Retrieval.textRank(docs, "text", 2)
      .collect().map(_.getString(0)).toSet
    assert(got === Set("only", "solo"))
  }

  test("textRank: the connector outranks an equally-present leaf") {
    val docs = Seq("hubx leaf", "hubx node", "hubx more", "hubx etc9")
      .toDF("text")
    val ranks = Retrieval.textRank(docs, "text", 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ranks("hubx") > ranks("leaf"))
  }
}
