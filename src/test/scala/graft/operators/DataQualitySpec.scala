package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import org.apache.spark.sql.functions._

/** DataQuality pinned on hand-countable corpora, plus the one-scan
  * plan shape the k-rules-one-pass claim rests on. */
class DataQualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rows = Seq(
    (1L, 10L, "a"), (2L, -5L, "b"), (3L, 0L, null.asInstanceOf[String]),
    (4L, 200L, "a"), (4L, 7L, "c"))

  test("audit: per-rule violation counts from one corpus") {
    val df = rows.toDF("id", "v", "s")
    val got = DataQuality.audit(df, Seq(
      "v_positive" -> (col("v") <= 0),
      "v_below_100" -> (col("v") > 100),
      "s_complete" -> col("s").isNull))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(
      "v_positive" -> ((5L, 2L)),   // -5 and 0
      "v_below_100" -> ((5L, 1L)),  // 200
      "s_complete" -> ((5L, 1L))))  // the null
  }

  test("audit: null predicate result counts as non-violation") {
    // col > 0 over a null value is null, not true — must not count.
    val df = Seq((1L, Some(5L)), (2L, None)).toDF("id", "v")
    val got = DataQuality.audit(df, Seq("neg" -> (col("v") < 0)))
      .collect().head
    assert((got.getLong(1), got.getLong(2)) == ((2L, 0L)))
  }

  test("uniqueness: dup rows beyond the first per key") {
    val got = DataQuality.uniqueness(rows.toDF("id", "v", "s"), "pk",
      Seq("id")).collect().head
    assert(got.getString(0) == "pk")
    assert((got.getLong(1), got.getLong(2)) == ((5L, 1L)))  // id=4 twice
  }

  test("referential: child keys missing from the parent") {
    val child = Seq((1L, "x"), (2L, "y"), (9L, "z"), (9L, "w"))
      .toDF("fk", "payload")
    val parent = Seq((1L, "p"), (2L, "q"), (3L, "r")).toDF("pk", "name")
    val got = DataQuality.referential(child, parent, "fk_ri", "fk", "pk")
      .collect().head
    assert((got.getString(0), got.getLong(1), got.getLong(2)) == (("fk_ri", 4L, 2L)))
  }

  test("k predicate rules compile to ONE scan of the input") {
    val df = rows.toDF("id", "v", "s")
    val plan = DataQuality.audit(df, Seq(
      "a" -> (col("v") <= 0), "b" -> (col("v") > 100),
      "c" -> col("s").isNull)).queryExecution.executedPlan.toString
    // one LocalTableScan / scan node, no join, no union of per-rule scans
    assert(plan.split("LocalTableScan").length - 1 == 1)
    assert(!plan.contains("Union"))
  }

  private def kappaOf(labels: Seq[(Boolean, Boolean)]): Option[Long] = {
    val df = labels.toDF("a", "b")
    Option(DataQuality.agreementKappa(df, col("a"), col("b"))
      .collect().head.getAs[java.lang.Long]("kappa_ppm")).map(_.toLong)
  }

  test("kappa: perfect agreement with mixed marginals = 1e6") {
    assert(kappaOf(Seq((true, true), (false, false), (true, true))) ===
      Some(1000000L))
  }

  test("kappa: independent-looking raters land at zero") {
    // 2x2 contingency exactly matching the product of its marginals:
    // a1=2/4, b1=2/4, each cell 1 -> agree=2, pe_num=8, n*agree=8
    assert(kappaOf(Seq((true, true), (true, false),
      (false, true), (false, false))) === Some(0L))
  }

  test("kappa: systematic disagreement is negative") {
    val k = kappaOf(Seq((true, false), (false, true),
      (true, false), (false, true))).get
    assert(k < 0L)
  }

  test("kappa: both raters constant -> undefined (NULL), not zero") {
    assert(kappaOf(Seq((true, true), (true, true))) === None)
  }

  test("setConfusion: counts, exact ppm metrics, NULL on empty denominators") {
    val cand = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 3L)).toDF("a", "b")
    val truth = Seq((1L, 2L), (4L, 5L)).toDF("a", "b")
    val r = DataQuality.setConfusion(cand, truth, Seq("a", "b")).collect().head
    // dup candidate collapses: 3 candidates, 2 truth, 1 hit
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((3L, 2L, 1L)))
    assert(r.getLong(3) === 333333L)          // precision 1/3
    assert(r.getLong(4) === 500000L)          // recall 1/2
    assert(r.getLong(5) === 400000L)          // f1 = 2/(3+2)
    val empty = truth.filter(col("a") > 100L)
    val r2 = DataQuality.setConfusion(cand, empty, Seq("a", "b"))
      .collect().head
    assert(r2.isNullAt(4), "recall must be NULL with empty truth")
    assert(r2.getLong(2) === 0L)
  }

  test("calibrationCurve: buckets, rates, and negative-score flooring") {
    // scores in [-8, 7], shift 8, width 4 -> buckets 0..3
    val rows = Seq(
      (-8L, false), (-6L, false), (-5L, true),  // bucket 0: 1/3 pos
      (-2L, false), (-1L, true),                // bucket 1: 1/2
      (0L, true), (3L, true),                   // bucket 2: 2/2
      (5L, true), (7L, false))                  // bucket 3: 1/2
    val df = rows.toDF("s", "l")
    val got = DataQuality.calibrationCurve(df, col("s"), col("l"), 8L, 4L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(
      0L -> ((3L, 1L, 333333L)), 1L -> ((2L, 1L, 500000L)),
      2L -> ((2L, 2L, 1000000L)), 3L -> ((2L, 1L, 500000L))))
  }

  test("kappa: hand-computed textbook case") {
    // n=10, a1=6, b1=5, agree=7 -> pe_num=6*5+4*5=50
    // kappa = (70-50)/(100-50) = 0.4
    val labels = Seq.fill(4)((true, true)) ++ Seq.fill(2)((true, false)) ++
      Seq.fill(1)((false, true)) ++ Seq.fill(3)((false, false))
    assert(kappaOf(labels) === Some(400000L))
  }
}
