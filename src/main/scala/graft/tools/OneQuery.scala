package graft.tools

import org.apache.spark.sql.SparkSession

/** Time one registry query N times in this JVM (isolation probe).
  * Usage: runMain graft.tools.OneQuery <query> [sfDir] [n] */
object OneQuery {
  def main(args: Array[String]): Unit = {
    val q = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val n = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (i <- 1 to n) {
      val t0 = System.nanoTime()
      // noop WRITE, not count(): count() lets Catalyst prune projection
      // work (e.g. d5's jaccard column) and under-measures the query —
      // same rule as HeavyRunner
      graft.SparkEntry.queries(q)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"ONEQUERY\t$q\trun$i\t${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    graft.SparkEntry.clearCaches(spark)
    spark.stop()
  }
}
