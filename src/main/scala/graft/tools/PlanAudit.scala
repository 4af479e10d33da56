package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.SparkEntry

/** Plan-quality audit: execute the named gate queries and print a
  * compact operator census of each FINAL (post-AQE) physical plan —
  * exchanges, joins (by strategy), window sorts, scans — plus the full
  * formatted plan when `-v`. The per-round habit this serves: after
  * correctness is green, look at the plan you actually got and decide
  * whether it's the plan you'd want at 1000 executors.
  *
  * Usage: runMain graft.tools.PlanAudit <sfDir> [-v] <query...>
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println(
        "usage: runMain graft.tools.PlanAudit <sfDir> [-v] <query...>")
      sys.exit(2)
    }
    val sfDir = args(0)
    val verbose = args.contains("-v")
    val names = args.drop(1).filterNot(_ == "-v")
    val spark = SparkSession.builder().master("local[8]")
      .appName("graft-plan-audit")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def finalPlan(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    def census(p: SparkPlan): Map[String, Int] = {
      def walk(n: SparkPlan): Seq[String] = n match {
        // stage/adaptive wrappers hold their subtree outside children
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          q.getClass.getSimpleName +: walk(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          Seq(r.getClass.getSimpleName) // don't double-count the reused subtree
        case other =>
          val kids = other.children ++ other.subqueries
          other.getClass.getSimpleName +: kids.flatMap(walk)
      }
      walk(finalPlan(p)).groupBy(identity).view.mapValues(_.size).toMap
    }
    val interesting = Seq("ShuffleExchangeExec", "BroadcastExchangeExec",
      "SortMergeJoinExec", "BroadcastHashJoinExec", "ShuffledHashJoinExec",
      "BroadcastNestedLoopJoinExec", "CartesianProductExec", "SortExec",
      "WindowExec", "FileSourceScanExec", "GenerateExec", "ExpandExec")

    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect() // materialize so AQE finalizes every stage
      val c = census(df.queryExecution.executedPlan)
      val line = interesting.flatMap(k => c.get(k).map(v =>
        s"${k.stripSuffix("Exec")}=$v")).mkString(" ")
      println(s"PLAN\t$name\t$line")
      if (verbose) println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    SparkEntry.clearCaches(spark)
    spark.stop()
  }
}
