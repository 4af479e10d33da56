package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the final adaptive plan of a named query on a given dir.
  * Usage: runMain graft.tools.PlanCheck <query> [sfDir] */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val q = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(q)(spark, sfDir)
    df.collect()
    println(df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0))
    spark.stop()
  }
}
