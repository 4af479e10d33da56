package graft.tools

import org.apache.spark.sql.SparkSession

/** Run a sequence of queries once each, then time the LAST one 3x —
  * bisection probe for in-session interference.
  * Usage: runMain graft.tools.SeqProbe <q1,q2,...> <target> [sfDir] */
object SeqProbe {
  def main(args: Array[String]): Unit = {
    val pre = args(0).split(",").filter(_.nonEmpty)
    val target = args(1)
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // noop WRITE, not count() — count() lets Catalyst prune projection
    // work and under-measures (HeavyRunner's rule)
    def force(q: String): Unit =
      graft.SparkEntry.queries(q)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    pre.foreach { q =>
      val t0 = System.nanoTime()
      force(q)
      println(f"SEQPROBE\tpre\t$q\t${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      force(target)
      println(f"SEQPROBE\ttarget\t$target\trun$i\t${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    graft.SparkEntry.clearCaches(spark)
    spark.stop()
  }
}
