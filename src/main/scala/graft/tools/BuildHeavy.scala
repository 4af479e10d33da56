package graft.tools

import org.apache.spark.sql.SparkSession

import graft.HeavyData

/** Builds (or refreshes) the heavy bench dir without running Bench.
  * Usage: runMain graft.tools.BuildHeavy [sfDir] [outDir] [copies] */
object BuildHeavy {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(2).getOrElse("10").toInt
    val outDir = args.lift(1).getOrElse(s"/tmp/graft_heavy_x$copies")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    HeavyData.ensure(spark, sfDir, outDir, copies)
    spark.stop()
  }
}
