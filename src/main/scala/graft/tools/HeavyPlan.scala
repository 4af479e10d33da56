package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Prints the FINAL ADAPTIVE plan of selected queries at heavy scale:
  * executes the query (collect on the df itself — count() spawns a
  * different query execution and a noop write hides AQE's final plan
  * behind the write node), then dumps executedPlan. This is how the
  * "does AQE actually broadcast the unscaled dims at 10x?" question
  * gets settled with evidence instead of pre-execution explain(),
  * whose AdaptiveSparkPlan still says isFinalPlan=false.
  *
  * Usage: runMain graft.tools.HeavyPlan [dir] [query...]
  */
object HeavyPlan {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_heavy_x10")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q07_volume_shipping", "q18_large_orders")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      df.collect()
      println(s"\n===== $n (final adaptive plan, $dir) =====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
