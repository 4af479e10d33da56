package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The automaton against a brute-force indexOf reference: all
  * occurrences (overlapping included), nested/suffix patterns through
  * the fail-link output merge, and the DataFrame seam. */
class AhoCorasickSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def brute(text: String, patterns: Seq[String]): Map[Int, Int] =
    patterns.indices.map { pi =>
      val p = patterns(pi)
      var n = 0
      var i = text.indexOf(p)
      while (i >= 0) { n += 1; i = text.indexOf(p, i + 1) } // overlapping
      pi -> n
    }.filter(_._2 > 0).toMap

  test("classic fail-link cases: suffix patterns fire via output merge") {
    val ac = new AhoCorasick(Seq("he", "she", "his", "hers"))
    // "ushers": she@1-4, he@2-4, hers@2-6
    val got = ac.scan("ushers").toSeq.groupBy(_._1).view.mapValues(_.size).toMap
    assert(got == Map(0 -> 1, 1 -> 1, 3 -> 1))
    // counts() agrees
    assert(ac.counts("ushers").toSeq == Seq(1L, 1L, 0L, 1L))
  }

  test("overlapping occurrences of bordered patterns all count") {
    val ac = new AhoCorasick(Seq("aa", "aba"))
    assert(ac.counts("aaaa").toSeq == Seq(3L, 0L))
    assert(ac.counts("ababa").toSeq == Seq(0L, 2L)) // overlap at the 'a'
  }

  test("matches brute force on random texts over a random dictionary") {
    val rnd = new scala.util.Random(17)
    val alphabet = "abc"
    def randStr(n: Int) =
      (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val patterns = (1 to 12).map(_ => randStr(1 + rnd.nextInt(4))).distinct
    (1 to 30).foreach { _ =>
      val text = randStr(200)
      val got = patterns.indices
        .map(pi => pi -> new AhoCorasick(patterns).counts(text)(pi).toInt)
        .filter(_._2 > 0).toMap
      assert(got == brute(text, patterns), s"text=$text pats=$patterns")
    }
  }

  test("matchCounts seam: per-doc rows, misses absent, null-safe") {
    val docs = Seq((1L, "the table of value"), (2L, "no hits here"),
      (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = AhoCorasick.matchCounts(docs, Seq("table", "value", "zzz"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map((1L, "table") -> 1L, (1L, "value") -> 1L))
  }
}
