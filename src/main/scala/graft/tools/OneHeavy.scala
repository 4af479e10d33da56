package graft.tools
import org.apache.spark.sql.SparkSession
object OneHeavy {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (q <- args) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, "/tmp/graft_heavy_x10").count()
      println(f"[oneheavy] $q ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
