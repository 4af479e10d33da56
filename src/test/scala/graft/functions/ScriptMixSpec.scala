package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** ScriptMix pinned on closed-form class counts, the fixed tie
  * precedence, code-point (not UTF-16 unit) counting, and null
  * propagation. */
class ScriptMixSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(texts: Seq[String]) =
    TextQuality.scriptMix(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"), col("text")).orderBy("doc_id")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6)))

  test("class counts and dominant on known strings") {
    val got = run(Seq(
      "abc XYZ 123",      // 6 latin, 3 digit, 2 other (spaces)
      "привет",           // 6 cyrillic
      "你好世界!",         // 4 cjk, 1 other
      "",                 // empty -> all zero, precedence gives latin
      "a1б你 "))          // one of each + space
    assert(got(0) == ((6L, 3L, 0L, 0L, 2L, "latin")))
    assert(got(1) == ((0L, 0L, 6L, 0L, 0L, "cyrillic")))
    assert(got(2) == ((0L, 0L, 0L, 4L, 1L, "cjk")))
    assert(got(3) == ((0L, 0L, 0L, 0L, 0L, "latin")))
    assert(got(4) == ((1L, 1L, 1L, 1L, 1L, "latin")))
  }

  test("ties resolve by fixed precedence latin > digit > cyrillic > cjk > other") {
    assert(run(Seq("1б"))(0)._6 == "digit")    // digit ties cyrillic
    assert(run(Seq("б你"))(0)._6 == "cyrillic") // cyrillic ties cjk
    assert(run(Seq("你 "))(0)._6 == "cjk")      // cjk ties other
  }

  test("astral code points count once, as 'other'") {
    // U+1F600 (two UTF-16 units) is outside every named range
    val (l, d, cy, cj, o, dom) = run(Seq("😀😀"))(0)
    assert((l, d, cy, cj, o) == ((0L, 0L, 0L, 0L, 2L)) && dom == "other")
  }

  test("null text propagates null") {
    val out = TextQuality.scriptMix(
      Seq((1L, null: String)).toDF("doc_id", "text"), col("text")).collect()
    assert((1 to 6).forall(out(0).isNullAt))
  }
}
