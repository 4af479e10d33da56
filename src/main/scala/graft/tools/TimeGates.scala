package graft.tools

import org.apache.spark.sql.SparkSession

/** Micro-harness: time named gate queries in a FRESH session, in the
  * given order — the isolation probe behind in-session interference
  * triage (is a gate slow by itself, or only after N others ran?).
  * Same session config as Bench's light tier; warm-up = table counts
  * only, so the first gate carries the JIT/codegen cold cost — pass
  * it twice (or lead with a sacrificial gate) to split cold from
  * warm. Usage:
  *   java ... graft.tools.TimeGates <sfDir> <gate> [<gate> ...]
  */
object TimeGates {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master(
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-timegates")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.all.foreach(n => graft.Tables.load(spark, dir, n).count())
    val names =
      if (args.lift(1).contains("ALL"))
        graft.SparkEntry.queries.keys.toSeq.sorted
      else args.drop(1).toSeq
    names.foreach { q =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      // session-state counters beside every wall: pinned/persisted RDD
      // count and cumulative job count — the correlates an in-session
      // slowdown triage needs in the same line as the symptom
      val rdds = spark.sparkContext.getPersistentRDDs.size
      val jobs = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
      println(f"TIMED $q $dt%.2f s rdds=$rdds jobs=$jobs")
      Console.out.flush()
    }
    spark.stop()
  }
}
