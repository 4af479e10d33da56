package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query at the scale-factor dir
  * given by SPARK_GRAFT_SF_DIR (default sf0.1) and prints ONE JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * A warm-up pass (table counts + one full query) runs before any
  * timing so JIT/codegen/classloader costs are not attributed to the
  * first measured query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- warm-up (untimed) ----
    Tables.all.foreach(n => Tables.load(spark, sfDir, n).count())
    SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()

    // ---- timed runs, stable order, best-of-3 (variance control:
    // co-tenant noise/GC spikes were observed surviving best-of-2) ----
    val results = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try SparkEntry.queries(name)(spark, sfDir).count()
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}") }
        (System.nanoTime() - t0) / 1e9
      }
      name -> Seq(once(), once(), once()).min
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    SparkEntry.clearCaches(spark)
    spark.stop()
  }
}
