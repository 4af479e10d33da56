package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The gridded overlap join must be indistinguishable from the naive
  * inequality join: exactly the overlapping pairs, each EXACTLY ONCE
  * (the responsibility-bucket rule, not a distinct), half-open
  * boundary semantics, and degenerate inputs (empty intervals,
  * multi-bucket spans, bucket-straddling pairs) handled. */
class IntervalJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("matches brute force on random intervals, each pair exactly once") {
    val rnd = new scala.util.Random(5)
    // widths from sub-bucket to 7 buckets at bucketSeconds=10
    val ivals = (1 to 120).map { i =>
      val s = rnd.nextInt(2000).toLong
      (i.toLong, s, s + 1 + rnd.nextInt(70).toLong)
    }
    val df = ivals.toDF("id", "s", "e")
    val got = IntervalJoin.overlapJoin(df, df, "s", "e", 10)
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))

    val ref = (for {
      a <- ivals; b <- ivals
      if a._1 < b._1 && a._2 < b._3 && b._2 < a._3
    } yield (a._1, b._1))

    assert(got.sorted.toSeq == ref.sorted.toSeq) // seq compare: dups would show
    assert(got.length == got.toSet.size, "pair emitted more than once")
    assert(ref.nonEmpty)
  }

  test("half-open semantics: touching intervals do not overlap") {
    val a = Seq((1L, 0L, 100L)).toDF("id", "s", "e")
    val b = Seq((2L, 100L, 200L), (3L, 99L, 200L)).toDF("id", "s", "e")
    val got = IntervalJoin.overlapJoin(a, b, "s", "e", 60)
      .select("b_id").as[Long].collect().toSet
    assert(got == Set(3L))
  }

  test("empty intervals join nothing; long spans still emit once") {
    val a = Seq((1L, 50L, 50L), (2L, 0L, 100000L)).toDF("id", "s", "e")
    val b = Seq((10L, 40L, 60L)).toDF("id", "s", "e")
    val got = IntervalJoin.overlapJoin(a, b, "s", "e", 10)
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((2L, 10L))) // the empty interval is absent; the
    // 10000-bucket span reports its overlap exactly once
  }
}
