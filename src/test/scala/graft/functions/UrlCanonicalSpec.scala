package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** TextQuality.canonicalUrl pinned rule by rule on hand vectors, plus
  * the invariants that make it safe to key dedup on: idempotence
  * (canon(canon(u)) == canon(u)) and case/param-order insensitivity
  * collapsing exactly the spellings that name the same resource. */
class UrlCanonicalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(us: String*): Seq[String] =
    us.toDF("u").select(TextQuality.canonicalUrl($"u").as("c"))
      .collect().toSeq.map(_.getString(0))

  test("rule vectors: fragment, case, default port, param sort, trailing slash") {
    val got = canon(
      "HTTP://WWW.Example.COM:80/Docs/D1?b=2&a=1",
      "http://www.example.com/Docs/D1/?a=1&b=2#sec",
      "https://Host.Example:443/x",
      "https://host.example:8443/x",      // non-default port kept
      "http://example.com/CaseKept/Path", // path case preserved
      "http://example.com/a?single=1",
      "http://example.com/plain")
    assert(got(0) === "http://www.example.com/Docs/D1?a=1&b=2")
    assert(got(1) === "http://www.example.com/Docs/D1?a=1&b=2")
    assert(got(2) === "https://host.example/x")
    assert(got(3) === "https://host.example:8443/x")
    assert(got(4) === "http://example.com/CaseKept/Path")
    assert(got(5) === "http://example.com/a?single=1")
    assert(got(6) === "http://example.com/plain")
  }

  test("idempotence: canonicalizing a canonical URL is a no-op") {
    val inputs = Seq(
      "HTTP://A.B:80/p/?z=1&a=2#f", "https://x.y/path?b=1&a=2",
      "http://h/p1/p2", "https://H:443/")
    val once = canon(inputs: _*)
    val twice = canon(once: _*)
    assert(once === twice)
  }

  test("same resource under two spellings collides; different resources do not") {
    val got = canon(
      "HTTP://E.com:80/r?b=2&a=1", "http://e.COM/r/?a=1&b=2#x",
      "http://e.com/other")
    assert(got(0) === got(1))
    assert(got(2) !== got(0))
  }
}
