package graft.tools
import org.apache.spark.sql.SparkSession
object ProfileE3Real {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_heavy_x10")
    val parts = args.lift(1).getOrElse("32")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-46s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    time("real e3 query")(graft.SparkEntry.queries("e3_pipeline_streams")(spark, sfDir).count())
    spark.stop()
  }
}
