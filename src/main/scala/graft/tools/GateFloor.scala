package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-gate FIXED-COST floor profiler (round 17, VERDICT item 2): the
  * light tier spends ~1.4 s/gate of shared overhead (374 gates, ~534 s
  * driver wall), and ~300 gates sit at 0.2-1.5 s where scan + exchange
  * + collect floor dominates operator work. This splits one gate's
  * wall into the pieces the bench's single `once()` number hides:
  *
  *   - build  = SparkEntry.queries(name)(spark, dir) — driver-side
  *     query CONSTRUCTION (includes any inner actions: bounded-scalar
  *     collects, temp-store seeding, streaming-query runs);
  *   - count  = the .count() action (planning + execution);
  *   - jobs   = Spark jobs dispatched by each phase (driver-dispatch
  *     counter — each job is a ~5-20 ms scheduler round-trip at
  *     local[32] before any task runs).
  *
  * Passes run back-to-back in one session so pass 1 carries JIT/
  * codegen cold cost and later passes show the warm floor.
  *
  * Usage: java ... graft.tools.GateFloor <sfDir> <passes> <gate> [...]
  */
object GateFloor {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val passes = args(1).toInt
    val spark = SparkSession.builder().master(
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-gatefloor")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.all.foreach(n => graft.Tables.load(spark, dir, n).count())
    val names =
      if (args.lift(2).contains("ALL"))
        graft.SparkEntry.queries.keys.toSeq.sorted
      else args.drop(2).toSeq
    def jobsNow: Int =
      spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    for (p <- 1 to passes; q <- names) {
      val j0 = jobsNow
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(q)(spark, dir)
      val t1 = System.nanoTime()
      val j1 = jobsNow
      df.count()
      val t2 = System.nanoTime()
      val j2 = jobsNow
      println(f"FLOOR $q pass=$p build=${(t1 - t0) / 1e9}%.3f " +
        f"count=${(t2 - t1) / 1e9}%.3f total=${(t2 - t0) / 1e9}%.3f " +
        s"buildJobs=${j1 - j0} countJobs=${j2 - j1}")
      Console.out.flush()
    }
    spark.stop()
  }
}
