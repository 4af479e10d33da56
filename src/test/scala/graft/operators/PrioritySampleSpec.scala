package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Sampling.prioritySample pinned on: exact driver-side priority
  * replay (md5-derived u, integer floor), k-truncation with the
  * documented tie algebra, determinism across reruns/partitionings,
  * and the size-bias property (heavier rows sample more often). */
class PrioritySampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  private def refPriority(key: Long, w: Long, seed: String = "pri"): Long = {
    val u = java.lang.Long.parseLong(md5hex(s"$seed|$key").take(5), 16) + 1L
    w * 1048576L / u
  }

  test("priorities match the driver-side md5 replay; top-k truncates with ties on key") {
    val rows = (1L to 50L).map(i => (i, i * 10))
    val df = rows.toDF("id", "w")
    val got = Sampling.prioritySample(df, "id", "w", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = rows.map { case (id, w) => (id, w, refPriority(id, w)) }
      .sortBy { case (id, _, p) => (-p, id) }.take(10)
    assert(got.toSeq === want)
  }

  test("deterministic under repartitioning") {
    val rows = (1L to 200L).map(i => (i, 1000L + (i % 17) * 31))
    val a = Sampling.prioritySample(rows.toDF("id", "w"), "id", "w", 25)
      .collect().map(_.getLong(0)).toSeq
    val b = Sampling.prioritySample(
        rows.toDF("id", "w").repartition(13), "id", "w", 25)
      .collect().map(_.getLong(0)).toSeq
    assert(a === b)
  }

  test("size bias: a 100x-heavier stratum dominates the sample") {
    val heavy = (1L to 50L).map(i => (i, 100000L))
    val light = (51L to 1050L).map(i => (i, 1000L))
    val got = Sampling.prioritySample((heavy ++ light).toDF("id", "w"),
      "id", "w", 40).collect().map(_.getLong(0))
    val nHeavy = got.count(_ <= 50L)
    assert(nHeavy > 25, s"expected heavy stratum to dominate, got $nHeavy/40")
  }

  test("zero-weight rows never outrank positive weights") {
    val df = (1L to 20L).map(i => (i, if (i <= 10) 0L else 5L)).toDF("id", "w")
    val got = Sampling.prioritySample(df, "id", "w", 10)
      .collect().map(_.getLong(0))
    assert(got.forall(_ > 10L))
  }
}
