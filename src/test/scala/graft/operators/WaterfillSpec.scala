package graft.operators

import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Sampling.waterfillAllocation against hand-computed fills plus the
  * defining property of the water level: cap is the MAXIMAL integer
  * with sum(min(supply, cap)) <= budget. */
class WaterfillSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(supplies: Seq[(String, Long)], budget: Long)
  : (Option[Long], Map[String, Long]) = {
    val df = supplies.toDF("k", "supply")
    val rows = Sampling.waterfillAllocation(df, "k", "supply", budget)
      .collect()
    val caps = rows.map(r => Option(r.getAs[java.lang.Long]("cap"))
      .map(_.toLong)).distinct
    assert(caps.length === 1, "cap must be identical on every row")
    assert(rows.forall(_.getAs[Long]("budget") === budget))
    (caps.head, rows.map(r => r.getAs[String]("k") -> r.getAs[Long]("alloc")).toMap)
  }

  test("hand-computed fill: budget 12 over supplies 1/3/6/10") {
    // sorted prefix: 1,4,10,20; binding at s=6 (10 + 1*6 > 12):
    // cap = (12 - 4) div 2 = 4 -> allocs 1,3,4,4 (sum 12, exact)
    val (cap, alloc) = run(Seq("a" -> 1L, "b" -> 3L, "c" -> 6L, "d" -> 10L), 12L)
    assert(cap === Some(4L))
    assert(alloc === Map("a" -> 1L, "b" -> 3L, "c" -> 4L, "d" -> 4L))
  }

  test("budget covers total supply: cap NULL, everything kept") {
    val (cap, alloc) = run(Seq("a" -> 1L, "b" -> 3L, "c" -> 6L), 10L)
    assert(cap === None)
    assert(alloc === Map("a" -> 1L, "b" -> 3L, "c" -> 6L))
  }

  test("budget 0: cap 0, nothing allocated") {
    val (cap, alloc) = run(Seq("a" -> 5L, "b" -> 2L), 0L)
    assert(cap === Some(0L))
    assert(alloc.values.forall(_ === 0L))
  }

  test("cap is the maximal level: sum(min(s,cap)) <= budget < sum(min(s,cap+1))") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 8) {
      val supplies = (0 until 2 + rnd.nextInt(9))
        .map(i => s"k$i" -> (rnd.nextInt(50).toLong))
      val total = supplies.map(_._2).sum
      val budget = rnd.nextInt(math.max(1, total.toInt + 5)).toLong
      val (cap, alloc) = run(supplies, budget)
      val sup = supplies.toMap
      assert(alloc.forall { case (k, a) => a <= sup(k) }, s"trial $trial")
      cap match {
        case None =>
          assert(total <= budget, s"trial $trial: NULL cap but total > budget")
          assert(alloc === sup)
        case Some(c) =>
          val at = supplies.map { case (_, s) => math.min(s, math.max(0L, c)) }.sum
          val above = supplies.map { case (_, s) => math.min(s, c + 1) }.sum
          assert(at <= budget, s"trial $trial: cap $c overspends")
          assert(above > budget, s"trial $trial: cap $c not maximal")
          assert(alloc.values.sum === at, s"trial $trial")
      }
    }
  }

  test("tokenBudgetAllocated: per-source caps, accumulate-then-cut boundary") {
    val docs = Seq(
      (1L, "a b c", "s1"), (2L, "d e", "s1"), (3L, "f", "s1"),
      (4L, "g h i j", "s2"))
      .toDF("doc_id", "text", "s")
    // s1 alloc 4: admission order is md5-determined; the doc that
    // CROSSES the cap is admitted (tok_before < alloc), later ones cut.
    // s2 alloc = supply: everything admitted.
    val alloc = Seq(("s1", 4L), ("s2", 4L)).toDF("s", "alloc")
    val got = Sampling.tokenBudgetAllocated(docs, alloc, "s")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("tok_before")))
      .toMap
    assert(got.contains(4L))
    // replay the md5 order for s1 and apply the boundary rule
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long) = md.digest(s"tb|$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val s1 = Seq((1L, 3L), (2L, 2L), (3L, 1L)).sortBy(d => (h(d._1), d._1))
    var run = 0L
    val expected = s1.flatMap { case (id, n) =>
      val before = run; run += n
      if (before < 4L) Some(id -> before) else None
    }.toMap
    assert(got - 4L === expected)
    // zero alloc admits nothing from that source
    val none = Sampling.tokenBudgetAllocated(docs,
      Seq(("s1", 0L), ("s2", 99L)).toDF("s", "alloc"), "s")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(none === Set(4L))
  }

  test("tokenBudgetAllocated: a source ABSENT from alloc admits nothing") {
    val docs = Seq(
      (1L, "a b c", "s1"), (2L, "d e", "s1"),
      (4L, "g h i j", "ghost")) // no alloc row for "ghost"
      .toDF("doc_id", "text", "s")
    val alloc = Seq(("s1", 99L)).toDF("s", "alloc")
    val got = Sampling.tokenBudgetAllocated(docs, alloc, "s").collect()
    // present source keeps everything; the missing source is an
    // explicit alloc=0 (admit nothing), not a silent row drop
    assert(got.map(_.getAs[Long]("doc_id")).toSet === Set(1L, 2L))
    assert(got.forall(_.getAs[Long]("alloc") === 99L))
  }

  test("waterfill: past the domain-cardinality bound the plan RAISES") {
    val supplies = spark.range(Sampling.WaterfillMaxDomains + 1)
      .select(col("id").as("k"), lit(1L).as("supply"))
    val e = intercept[Exception] {
      Sampling.waterfillAllocation(supplies, "k", "supply", 10L).collect()
    }
    val chain = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(chain.contains("domains exceed"))
  }

  test("share form reduces the fraction first: 500000/1000000 == 1/2") {
    val supplies = Seq("a" -> 7L, "b" -> 21L, "c" -> 14L, "d" -> 3L)
    val df = supplies.toDF("k", "supply")
    def allocs(numer: Long, denom: Long) =
      Sampling.waterfillAllocationShare(df, "k", "supply", numer, denom)
        .collect().map(r => (r.getAs[String]("k"), r.getAs[Long]("alloc")))
        .toMap
    assert(allocs(500000L, 1000000L) === allocs(1L, 2L))
  }

  test("share form: 90% budget equals the explicit-budget form") {
    val supplies = Seq("a" -> 7L, "b" -> 21L, "c" -> 14L, "d" -> 3L)
    val df = supplies.toDF("k", "supply")
    val viaShare = Sampling.waterfillAllocationShare(df, "k", "supply", 9L, 10L)
      .collect().map(r => (r.getAs[String]("k"), r.getAs[Long]("alloc"))).toMap
    val (_, viaBudget) = run(supplies, supplies.map(_._2).sum * 9 / 10)
    assert(viaShare === viaBudget)
  }
}
