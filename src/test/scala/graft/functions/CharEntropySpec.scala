package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** CharEntropy pinned on known closed forms, the positive-zero edge,
  * code-point (not UTF-16 unit) semantics, and equivalence with an
  * independent per-string reference over arbitrary text. */
class CharEntropySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(texts: Seq[String]) =
    TextQuality.charEntropy(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")).orderBy("doc_id")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))

  test("closed forms: uniform k-symbol strings have log2(k) bits") {
    val got = run(Seq("aaaa", "abab", "abcd", "aabbccdd"))
    assert(got(0) == ((4L, 1L, 0.0)))
    assert(got(1) == ((4L, 2L, 1.0)))
    assert(got(2) == ((4L, 4L, 2.0)))
    assert(got(3) == ((8L, 4L, 2.0)))
  }

  test("single-symbol entropy is POSITIVE zero (hash-stable vs -0.0)") {
    val bits = java.lang.Double.doubleToRawLongBits(run(Seq("zzzz"))(0)._3)
    assert(bits == 0L, "entropy of a constant string must be +0.0")
  }

  test("empty string -> (0, 0, 0.0); null -> null") {
    assert(run(Seq(""))(0) == ((0L, 0L, 0.0)))
    val rows = Seq((1L, null: String)).toDF("doc_id", "text")
    val out = TextQuality.charEntropy(rows).collect()
    assert(out(0).isNullAt(1) && out(0).isNullAt(2) && out(0).isNullAt(3))
  }

  test("code points, not UTF-16 units: astral chars count once") {
    // U+1F600 is two UTF-16 units but ONE character to SQL len/substr
    val (n, d, e) = run(Seq("😀😀a"))(0)
    assert(n == 3L && d == 2L)
    val p1 = 2.0 / 3; val p2 = 1.0 / 3
    val exp = 0.0 - (p1 * (math.log(p1) / math.log(2.0))
      + p2 * (math.log(p2) / math.log(2.0)))
    assert(math.abs(e - BigDecimal(exp).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
  }

  test("matches an independent reference on arbitrary text") {
    val texts = Seq("the quick brown fox", "mississippi", "a b a b  c",
      "0123456789abcdef" * 3)
    val got = run(texts)
    texts.zip(got).foreach { case (t, (n, d, e)) =>
      val counts = t.codePoints().toArray.groupBy(identity).values.map(_.length)
      assert(n == t.codePointCount(0, t.length).toLong)
      assert(d == counts.size.toLong)
      val total = counts.sum.toDouble
      val exp = 0.0 - counts.map { c =>
        val p = c / total; p * (math.log(p) / math.log(2.0))
      }.sum
      assert(math.abs(e - exp) < 1e-6, s"entropy($t)")
    }
  }
}
