package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Prints `.explain("formatted")` for selected queries — the review
  * loop for scan pushdown (PushedFilters/ReadSchema), join strategy
  * (broadcast vs SMJ) and WholeStageCodegen coverage.
  *
  * Usage: runMain graft.tools.PlanAudit [sfDir] [query...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("s4_incremental_scan", "j1_join_revenue", "r3_spine_join",
        "a3_rolling_triang", "n1_ann_topk", "d3_lsh_pairs")
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
