package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** Suffix-array substring dedup (d19) against its bucketed-pair
  * predecessor (d12): agreement where both apply, and the corpora
  * where d12's anchor df-cap PROVABLY misses what the suffix machinery
  * finds. */
class SuffixDupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def words(prefix: String, n: Int) =
    (1 to n).map(i => s"${prefix}$i").mkString(" ")

  test("agrees with d12 on a pair both can see") {
    // docs 1,2 share a unique 14-token run; 10 filler docs of unique
    // tokens keep every anchor bucket tiny
    val run = words("shared", 14)
    val docs = (Seq(
      (1L, s"${words("apre", 3)} $run ${words("apost", 3)}"),
      (2L, s"${words("bpre", 5)} $run")) ++
      (3 to 12).map(i => (i.toLong, words(s"fill${i}_", 25)))).toDF("doc_id", "text")
    val d12 = Dedup.longestCommonRuns(docs, 8, 12, 100).collect()
    assert(d12.length == 1 && d12.head.getAs[Long]("doc_a") == 1L
      && d12.head.getAs[Long]("max_run") == 14L)
    val d19 = Dedup.suffixDupSpans(docs, 12).orderBy("doc_id").collect()
    assert(d19.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L))
    // a 14-token shared run = 3 duplicate 12-window starts, span 14
    assert(d19.forall(_.getAs[Long]("max_dup_span") == 14L))
    assert(d19.forall(_.getAs[Long]("n_dup_starts") == 3L))
  }

  test("finds boilerplate runs d12's anchor df-cap structurally drops") {
    // 120 docs all carry the same 12-token boilerplate: every anchor
    // 8-gram inside it has df 120 > maxBucket 100, so d12 sees ZERO
    // candidate pairs; the suffix path has no buckets to saturate
    val boiler = words("boiler", 12)
    val docs = (1 to 120).map(i =>
      (i.toLong, s"${words(s"u${i}_", 4)} $boiler ${words(s"v${i}_", 4)}"))
      .toDF("doc_id", "text")
    assert(Dedup.longestCommonRuns(docs, 8, 12, 100).isEmpty)
    val d19 = Dedup.suffixDupSpans(docs, 12).collect()
    assert(d19.length == 120)
    assert(d19.forall(_.getAs[Long]("max_dup_span") == 12L))
  }

  test("within-doc repeats count (Lee et al. semantics) and span length is exact") {
    // one doc repeats a 13-token phrase twice with unique tokens
    // between: both occurrences' windows collide, span = 13
    val phrase = words("rep", 13)
    val docs = Seq(
      (1L, s"$phrase ${words("mid", 9)} $phrase"),
      (2L, words("other", 30))).toDF("doc_id", "text")
    val got = Dedup.suffixDupSpans(docs, 12).collect()
    assert(got.length == 1 && got.head.getAs[Long]("doc_id") == 1L)
    assert(got.head.getAs[Long]("max_dup_span") == 13L)
    // two occurrences x two 12-window starts each
    assert(got.head.getAs[Long]("n_dup_starts") == 4L)
  }

  test("non-default minRun (16) reports exactly-minRun spans once per doc") {
    val run = words("p2", 16)
    val docs = Seq(
      (1L, s"$run ${words("x", 3)}"),
      (2L, s"${words("y", 3)} $run"),
      (3L, words("z", 20))).toDF("doc_id", "text")
    val got = Dedup.suffixDupSpans(docs, 16).orderBy("doc_id").collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L))
    assert(got.forall(_.getAs[Long]("max_dup_span") == 16L))
    assert(got.forall(_.getAs[Long]("n_dup_starts") == 1L))
  }

  test("substringScrub keeps the corpus-first occurrence and rewrites the rest") {
    val span = words("s", 15) // 15-token duplicated span
    val docA = s"${words("x", 5)} $span ${words("y", 5)}"
    val docB = s"${words("z", 5)} $span ${words("q", 5)}"
    val docs = Seq((1L, docA), (2L, docB)).toDF("doc_id", "text")
    val got = Dedup.substringScrub(docs, 12).orderBy("doc_id").collect()
    assert(got.length == 2)
    // doc 1 is canonical: untouched
    assert(got(0).getAs[Long]("n_removed") == 0L)
    assert(got(0).getAs[String]("cleaned_text") == docA)
    // doc 2 loses exactly the 15 span tokens (island of 4 starts + 11)
    assert(got(1).getAs[Long]("n_removed") == 15L)
    assert(got(1).getAs[String]("cleaned_text") ==
      s"${words("z", 5)} ${words("q", 5)}")
  }

  test("substringScrub removes the second within-doc occurrence only") {
    val t13 = words("t", 13)
    val doc = s"${words("u", 3)} $t13 ${words("v", 2)} $t13 ${words("w", 2)}"
    val docs = Seq((1L, doc)).toDF("doc_id", "text")
    val got = Dedup.substringScrub(docs, 12).collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("n_removed") == 13L)
    assert(got.head.getAs[String]("cleaned_text") ==
      s"${words("u", 3)} $t13 ${words("v", 2)} ${words("w", 2)}")
  }

  test("incrementalScrub: index grams win, batch-internal repeats elect first") {
    val span = words("s", 15)  // present in the accepted corpus
    val t13 = words("t", 13)   // novel, repeated within the batch
    val index = Seq((1L, s"${words("a", 4)} $span")).toDF("doc_id", "text")
    val batch = Seq(
      // copies an indexed span -> removed entirely
      (4L, s"${words("z", 5)} $span ${words("q", 5)}"),
      // novel repeated span -> first occurrence kept, second removed
      (8L, s"${words("u", 3)} $t13 ${words("v", 2)} $t13 ${words("w", 2)}"),
      // fully novel -> untouched
      (12L, words("n", 30))).toDF("doc_id", "text")
    val got = Dedup.incrementalScrub(index, batch, 12)
      .orderBy("doc_id").collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSeq == Seq(4L, 8L, 12L))
    assert(got(0).getAs[Long]("n_removed") == 15L)
    assert(got(0).getAs[String]("cleaned_text") ==
      s"${words("z", 5)} ${words("q", 5)}")
    assert(got(1).getAs[Long]("n_removed") == 13L)
    assert(got(1).getAs[String]("cleaned_text") ==
      s"${words("u", 3)} $t13 ${words("v", 2)} ${words("w", 2)}")
    assert(got(2).getAs[Long]("n_removed") == 0L)
    assert(got(2).getAs[String]("cleaned_text") == words("n", 30))
  }

  test("incrementalScrub == substringScrub of the union when index ids precede") {
    // when every index doc_id < every batch doc_id, the from-scratch
    // scrub's canonical election agrees with "the index always wins",
    // so the incremental result must equal the union scrub restricted
    // to batch docs — the same stability contract d18 pins for the
    // cluster index
    val span = words("s", 14)
    val boiler = words("b", 12)
    val index = Seq(
      (1L, s"${words("a", 4)} $span $boiler"),
      (2L, s"$boiler ${words("c", 6)}")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, s"${words("x", 3)} $span"),
      (11L, s"$boiler $boiler"),
      (12L, words("y", 20))).toDF("doc_id", "text")
    val inc = Dedup.incrementalScrub(index, batch, 12)
      .orderBy("doc_id").collect()
    val full = Dedup.substringScrub(index.unionByName(batch), 12)
      .filter(col("doc_id") >= 10L).orderBy("doc_id").collect()
    assert(inc.map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq ==
      full.map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq)
  }

  test("substringScrub scrubs an exact-duplicate doc to empty text") {
    val body = words("d", 25)
    val docs = Seq((1L, body), (2L, body)).toDF("doc_id", "text")
    val got = Dedup.substringScrub(docs, 12).orderBy("doc_id").collect()
    assert(got.length == 2)
    assert(got(0).getAs[Long]("n_removed") == 0L)
    assert(got(0).getAs[String]("cleaned_text") == body)
    assert(got(1).getAs[Long]("n_removed") == 25L)
    assert(got(1).getAs[String]("cleaned_text") == "")
  }

  test("d19 plan: exactly two corpus hash exchanges (gram count + doc islands)") {
    // the round-7 rewrite's whole point: the fixed-minRun criterion is
    // one count-over-gram exchange + one doc_id islands exchange — a
    // regression back to any join/doubling form shows up here first
    val docs = Seq((1L, words("a", 30)), (2L, words("b", 30)))
      .toDF("doc_id", "text")
    val plan = Dedup.suffixDupSpans(docs, 12)
      .queryExecution.executedPlan.toString
    val n = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(n == 2, s"d19 grew to $n hash exchanges:\n$plan")
    assert(!plan.contains("Join"), "d19 should be join-free")
  }
}
