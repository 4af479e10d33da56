package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MisraGriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def summaryItems(df: org.apache.spark.sql.DataFrame, k: Int): Set[String] =
    df.agg(MisraGries.heavyHitters(col("v"), k).as("hh"))
      .select(explode(col("hh.item")).as("i"))
      .collect().map(_.getString(0)).toSet

  test("membership guarantee holds across many partitions and merges") {
    // skewed stream: 'hot' is 40% of 10k rows, tail of 100 cold values;
    // k=4 counters, 16 partitions — merges and evictions both fire
    val rows = (1 to 10000).map { i =>
      if (i % 5 <= 1) "hot" else s"cold_${i % 100}"
    }
    val df = rows.toDF("v").repartition(16)
    val items = summaryItems(df, 4)
    // true freq 4000 > 10000/5 — MUST be present regardless of order
    assert(items.contains("hot"), s"guaranteed heavy hitter missing from $items")
    assert(items.size <= 4, "summary exceeded its k counters")
  }

  test("k >= distinct values degenerates to exact counts") {
    val df = (Seq.fill(7)("a") ++ Seq.fill(5)("b") ++ Seq.fill(2)("c"))
      .toDF("v").repartition(4)
    val got = df.agg(MisraGries.heavyHitters(col("v"), 8).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 7L, "b" -> 5L, "c" -> 2L))
  }

  test("per-group summaries are independent") {
    val rows = (1 to 1000).map(i => ("g" + (i % 2), if (i % 3 == 0) "x" else s"t$i"))
    val got = rows.toDF("g", "v").repartition(8)
      .groupBy("g").agg(MisraGries.heavyHitters(col("v"), 3).as("hh"))
      .select(col("g"), col("hh.item").as("items"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSet).toMap
    // 'x' is ~1/3 of each group (> 1/4 threshold at k=3) — present in both
    assert(got("g0").contains("x") && got("g1").contains("x"))
  }
}
