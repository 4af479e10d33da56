package graft.functions

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Plan-shape pin for the SCALE.md sketch claim: a mergeable
  * TypedImperativeAggregate exchanges per-partition PARTIAL BUFFERS,
  * never raw values — the executed plan must be ObjectHashAggregate
  * (partial) → exchange on the group key → ObjectHashAggregate
  * (final), i.e. the map side reduces its rows to one buffer per
  * (partition, group) before anything shuffles. A sort-based fallback
  * or a missing partial stage would silently exchange the corpus. */
class SketchPlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def finalPlan(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case other => other
  }

  private def pinPartialFinal(mkDf: => org.apache.spark.sql.DataFrame,
                              what: String): Unit = {
    // AQE wraps each stage in a QueryStageExec LEAF, hiding the
    // partial aggregate from collect(); the partial/final shape is a
    // static planning property, so pin it on the non-adaptive plan
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try pinOn(mkDf, what)
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  private def pinOn(df: org.apache.spark.sql.DataFrame,
                    what: String): Unit = {
    df.collect()
    val plan = finalPlan(df.queryExecution.executedPlan)
    val aggs = plan.collect { case a: ObjectHashAggregateExec => a }
    assert(aggs.size >= 2,
      s"$what: expected partial+final ObjectHashAggregate, got:\n$plan")
    val modes = aggs.flatMap(_.aggregateExpressions.map(_.mode.toString))
    assert(modes.contains("Partial") && modes.contains("Final"),
      s"$what: aggregate modes were $modes")
    // the exchange sits BETWEEN the two aggregate stages: the final
    // agg's subtree contains exchange -> partial agg
    val finalAgg = aggs.find(
      _.aggregateExpressions.exists(_.mode.toString == "Final")).get
    val below = finalAgg.collect { case e: ShuffleExchangeLike => e }
    assert(below.nonEmpty,
      s"$what: no exchange between partial and final aggregate:\n$plan")
    val partialUnderExchange = below.head.collect {
      case a: ObjectHashAggregateExec
        if a.aggregateExpressions.exists(_.mode.toString == "Partial") => a
    }
    assert(partialUnderExchange.nonEmpty,
      s"$what: partial aggregate is not below the exchange:\n$plan")
  }

  private val docs = (0L until 200L)
    .map(i => (i, s"g${i % 5}", 1L + (i * 37) % 5000))
    .toDF("id", "grp", "v").repartition(6)

  test("LogHistogram exchanges partial buffers, not values") {
    pinPartialFinal(
      docs.groupBy("grp").agg(LogHistogram.sketch(col("v"), 5).as("sk")),
      "log_histogram")
  }

  test("KMV exchanges partial buffers, not values") {
    pinPartialFinal(
      docs.groupBy("grp")
        .agg(KmvSketch.kmv(col("v").cast("string"), 16).as("sk")),
      "kmv")
  }

  test("Gramian exchanges one buffer per partition (global agg)") {
    val em = docs.select(array(col("v").cast("double"),
      (col("v") * 2).cast("double")).as("e"))
    pinPartialFinal(
      em.agg(Gramian.gramian(col("e"), 2).as("g")), "gramian")
  }
}
