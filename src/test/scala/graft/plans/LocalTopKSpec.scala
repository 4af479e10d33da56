package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftExtensions, Tables, TestSpark}
import graft.operators.Ann

class LocalTopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // parquet-backed fixture: the scan introduces no exchange of its own,
  // so plan asserts see only what the operator adds
  private def orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))

  private val keys = Seq(("o_totalprice", true), ("o_orderkey", false))

  test("physical plan: custom exec present, no exchange or sort anywhere") {
    GraftExtensions.register(spark)
    val pruned = LocalTopK.prune(orders, Seq("o_custkey"), keys, 3)
    // SparkPlan.nodeName strips the Exec suffix -> "LocalTopKPerGroup"
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTopKPerGroup"), s"custom operator missing:\n$plan")
    assert(!plan.contains("Exchange") && !plan.contains("Sort"),
      s"partition-local prune must not shuffle or sort:\n$plan")
  }

  test("prune keeps <= k rows per group per partition and never loses a winner") {
    GraftExtensions.register(spark)
    val df = orders
    val pruned = LocalTopK.prune(df, Seq("o_custkey"), keys, 3)
    val maxKept = pruned
      .withColumn("pid", spark_partition_id())
      .groupBy("pid", "o_custkey").count()
      .agg(max("count")).as[Long].collect()(0)
    assert(maxKept <= 3, s"a (partition, group) kept $maxKept > k rows")
    // no winner lost: global top-3 from the pruned set == from the input
    def top3(d: org.apache.spark.sql.DataFrame) = d
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .filter(col("rk") <= 3)
      .select("o_custkey", "rk", "o_orderkey")
      .orderBy("o_custkey", "rk").collect().toSeq
    assert(top3(pruned) == top3(df))
    assert(top3(df).nonEmpty)
  }

  test("null sort keys follow the same null ordering as the ranking window") {
    GraftExtensions.register(spark)
    // null scores in every group; desc => NullsLast in both the custom
    // heap's SortOrder and the window's col.desc
    val df = (0 until 400).map { i =>
      val score: java.lang.Double = if (i % 5 == 0) null else (i % 37).toDouble
      (i % 4L, i.toLong, score)
    }.toDF("gid", "doc_id", "score").repartition(8)
    val a = Ann.topKPerGroupLocal(df, Seq("gid"),
      Seq(("score", true), ("doc_id", false)), 6, "rnk")
      .select("gid", "rnk", "doc_id").orderBy("gid", "rnk").collect().toSeq
    val b = Ann.topKPerGroup(df, Seq("gid"),
      Seq(col("score").desc, col("doc_id")), 6, "rnk")
      .select("gid", "rnk", "doc_id").orderBy("gid", "rnk").collect().toSeq
    assert(a == b && a.size == 24)
  }

  test("topKPerGroupLocal equals the declarative two-phase topKPerGroup") {
    GraftExtensions.register(spark)
    val df = orders.repartition(16) // many partitions: heaps + merge both exercised
    val a = Ann.topKPerGroupLocal(df, Seq("o_custkey"), keys, 5, "rnk")
      .select("o_custkey", "rnk", "o_orderkey")
      .orderBy("o_custkey", "rnk").collect().toSeq
    val b = Ann.topKPerGroup(df, Seq("o_custkey"),
      Seq(col("o_totalprice").desc, col("o_orderkey")), 5, "rnk")
      .select("o_custkey", "rnk", "o_orderkey")
      .orderBy("o_custkey", "rnk").collect().toSeq
    assert(a == b && a.nonEmpty)
  }
}
