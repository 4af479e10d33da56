package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** boilerplateScrub pinned on its three semantic edges: removal of
  * ALL occurrences (vs chunkDedup's keep-first election), document
  * frequency counted over DISTINCT docs (within-doc repeats are not
  * boilerplate), and the scrubbed-to-empty doc keeping its row. */
class BoilerplateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private val corpus = Seq(
    1L -> "aa bb cc dd",    // shares "aa bb" with 2 and 4
    2L -> "aa bb ee ff",
    3L -> "gg hh gg hh",    // within-doc repeat only — df = 1
    4L -> "aa bb")          // all boilerplate

  private def run(minDocs: Long): Map[Long, (Long, Long, String)] =
    Dedup.boilerplateScrub(corpus.toDF("doc_id", "text"), 2, minDocs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3)))).toMap

  test("df >= minDocs chunks removed from EVERY doc, unique chunks kept") {
    val got = run(2)
    assert(got(1L) == ((2L, 1L, md5hex("cc dd"))))
    assert(got(2L) == ((2L, 1L, md5hex("ee ff"))))
    assert(got(4L) == ((1L, 1L, md5hex(""))))  // scrubbed to empty, row kept
  }

  test("within-doc repeats are not boilerplate (distinct-doc frequency)") {
    val got = run(2)
    assert(got(3L) == ((2L, 0L, md5hex("gg hh gg hh"))))
  }

  test("threshold above max df removes nothing") {
    val got = run(4)
    assert(got.values.forall(_._2 == 0L))
    assert(got(1L)._3 == md5hex("aa bb cc dd"))
  }

  test("contrast with chunkDedup: election keeps one copy, scrub keeps zero") {
    val dedup = Dedup.chunkDedup(corpus.toDF("doc_id", "text"), 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // chunkDedup: doc 1 (first occurrence of "aa bb") keeps both chunks
    assert(dedup(1L) == 2L)
    // boilerplateScrub: doc 1 loses the shared chunk
    assert(run(2)(1L)._2 == 1L)
  }
}
