package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins [[TextQuality.bpeMerges]] to the STANDARD greedy BPE trainer:
  * a straight-line reference implementation (tf-weighted pair counts,
  * (count desc, lhs, rhs) argmax, greedy left-to-right non-overlapping
  * merge) is run on corpora the relational trainer historically got
  * wrong — adjacent same-symbol runs ("aaaa": a single-space replace
  * merges only every other pair) and quote/metacharacter tokens
  * ("don't": a string-interpolated expr() hands the quote to the SQL
  * parser and crashes the round). */
class BpeMergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference trainer: the textbook algorithm, no SQL. */
  private def referenceMerges(docs: Seq[String], rounds: Int): Seq[(Long, String, String, Long)] = {
    var vocab: Map[Vector[String], Long] = docs
      .flatMap(_.split(" ", -1)).groupBy(identity)
      .map { case (w, ws) => w.toVector.map(_.toString) -> ws.size.toLong }
    val out = Seq.newBuilder[(Long, String, String, Long)]
    for (r <- 1 to rounds) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((seg, tf) <- vocab; Seq(a, b) <- seg.sliding(2) if seg.size >= 2)
        counts((a, b)) = counts.getOrElse((a, b), 0L) + tf
      val ((l, rr), c) = counts.minBy { case ((a, b), n) => (-n, a, b) }
      out += ((r.toLong, l, rr, c))
      vocab = vocab.map { case (seg, tf) =>
        val merged = Vector.newBuilder[String]
        var i = 0
        while (i < seg.size) {
          if (i + 1 < seg.size && seg(i) == l && seg(i + 1) == rr) {
            merged += (l + rr); i += 2
          } else { merged += seg(i); i += 1 }
        }
        (merged.result(), tf)
      }.groupBy(_._1).map { case (seg, entries) => seg -> entries.map(_._2).sum }
    }
    out.result()
  }

  private def trained(docs: Seq[String], rounds: Int): Seq[(Long, String, String, Long)] =
    TextQuality.bpeMerges(docs.toDF("text"), rounds)
      .orderBy("round").as[(Long, String, String, Long)].collect().toSeq

  test("adjacent same-symbol runs merge greedily (aaaa -> aa aa, not aa a a)") {
    // Round 1 merges (a,a) everywhere: "aaaa" must become "aa aa", so
    // round 2's dominant pair is (aa,aa). The single-space replace bug
    // left "aa a a", whose round-2 argmax is (a,a) again.
    val got = trained(Seq("aaaa aaaa bz"), 2)
    assert(got(0) === ((1L, "a", "a", 6L)))
    assert(got(1) === ((2L, "aa", "aa", 2L)))
  }

  test("odd runs keep the greedy leftover (aaa -> aa a)") {
    val got = trained(Seq("aaa aaa aaa"), 2)
    assert(got(0) === ((1L, "a", "a", 6L)))
    // segs are "aa a": pairs (aa,a) x3 — NOT (a,aa) and NOT (aa,aa)
    assert(got(1) === ((2L, "aa", "a", 3L)))
  }

  test("quote and metacharacter tokens train green and match the reference") {
    // The r4 implementation inlined symbols into expr() SQL — any
    // apostrophe-bearing token crashed the round the moment the argmax
    // picked it. This corpus forces exactly that: ' is the most
    // frequent pair member by round 2.
    val docs = Seq(
      "don't don't don't can't won't",
      "don't you won't it's it's",
      "a$b a$b x\\y x\\y 100% 100%",
      "don't stop don't stop")
    val got = trained(docs, 5)
    val want = referenceMerges(docs, 5)
    assert(got === want)
    // non-vacuous: some merged symbol actually carries a quote
    assert(got.exists { case (_, l, r, _) => (l + r).contains("'") })
  }

  test("five rounds on a mixed corpus match the reference trainer") {
    val docs = Seq(
      "the cat sat on the mat",
      "the bats chat with the cats",
      "aaaa aaab aabb abbb bbbb",
      "lowering lowered lowers lower",
      "newest widest nicest lowest")
    assert(trained(docs, 5) === referenceMerges(docs, 5))
  }

  test("bpeTokenize: zero rounds = char count; token count shrinks with rounds") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "aaaa aaab bbbb"),
      (3L, "don't stop don't stop"))
    val df = docs.toDF("doc_id", "text")
    def totals(rounds: Int): (Long, Long) = {
      val r = TextQuality.bpeTokenize(df, rounds)
        .agg(org.apache.spark.sql.functions.sum("n_words"),
          org.apache.spark.sql.functions.sum("n_bpe_tokens")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val nChars = docs.map(_._2.count(_ != ' ') + 0L).sum
    val nWords = docs.map(_._2.split(" ", -1).length.toLong).sum
    val (w0, t0) = totals(0)
    assert(w0 == nWords && t0 == nChars,
      s"0 rounds must tokenize to characters: got $t0 of $nChars")
    val counts = (0 to 4).map(r => totals(r)._2)
    counts.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a, s"token count rose after a merge round: $counts")
    }
    // every word is at least one token
    assert(counts.last >= nWords)
  }
}
