package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** SkewSalt.skewAudit against a hand-computed distribution, plus the
  * plan shape that makes it 100 TB-safe: the top-k must be a
  * TakeOrdered (per-partition heaps), never a global Sort of the key
  * domain. */
class SkewAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // key sizes: a=10, b=5, c=3, d=3, e=1, f=1 -> total 23, n_keys 6
  // size histogram: 1->2, 3->2, 5->1, 10->1; cum 2,4,5,6
  // p50 rank ceil(6/2)=3 -> size 3; p99 rank ceil(5.94)=6 -> size 10
  private lazy val df = Seq("a" -> 10, "b" -> 5, "c" -> 3, "d" -> 3,
    "e" -> 1, "f" -> 1)
    .flatMap { case (k, n) => Seq.fill(n)(k) }.toDF("k")

  test("top keys, shares, and exact rank-based percentiles") {
    val rows = SkewSalt.skewAudit(df, Seq("k"), 3).orderBy("rank")
      .collect()
      .map(r => (r.getAs[String]("k"), r.getAs[Long]("rank"),
        r.getAs[Long]("n_rows"), r.getAs[Long]("share_ppm"),
        r.getAs[Long]("n_keys"), r.getAs[Long]("total_rows"),
        r.getAs[Long]("p50_size"), r.getAs[Long]("p99_size"),
        r.getAs[Long]("max_size")))
    assert(rows.toSeq === Seq(
      ("a", 1L, 10L, 10L * 1000000 / 23, 6L, 23L, 3L, 10L, 10L),
      ("b", 2L, 5L, 5L * 1000000 / 23, 6L, 23L, 3L, 10L, 10L),
      ("c", 3L, 3L, 3L * 1000000 / 23, 6L, 23L, 3L, 10L, 10L)))
  }

  test("single key: p50 = p99 = max = total") {
    val one = Seq.fill(7)("only").toDF("k")
    val r = SkewSalt.skewAudit(one, Seq("k")).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("share_ppm") === 1000000L)
    assert(r(0).getAs[Long]("p50_size") === 7L)
    assert(r(0).getAs[Long]("p99_size") === 7L)
    assert(r(0).getAs[Long]("max_size") === 7L)
  }

  test("uniform keys: every share equal, percentiles all the common size") {
    val uni = (0 until 8).flatMap(i => Seq.fill(4)(s"k$i")).toDF("k")
    val rows = SkewSalt.skewAudit(uni, Seq("k"), 8).collect()
    assert(rows.length === 8)
    assert(rows.forall(_.getAs[Long]("n_rows") === 4L))
    assert(rows.forall(_.getAs[Long]("p50_size") === 4L))
    assert(rows.forall(_.getAs[Long]("p99_size") === 4L))
    // rank ties broken by key asc: k0..k7 in order
    assert(rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[String]("k")).toSeq
      === (0 until 8).map(i => s"k$i"))
  }

  test("plan: top-k is TakeOrdered, not a global sort of the key domain") {
    val plan = SkewSalt.skewAudit(df, Seq("k"), 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }
}
