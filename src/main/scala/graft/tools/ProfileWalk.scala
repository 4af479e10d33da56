package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scratch profiler for the graph-ANN walk: counts jobs/stages and
  * their wall during one staged n23 execution. */
object ProfileWalk {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var stageMs = 0L
    val buf = new scala.collection.mutable.ArrayBuffer[String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onJobEnd(j: SparkListenerJobEnd): Unit = ()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages += 1
        val i = sc.stageInfo
        val ms = (for (s <- i.submissionTime; c <- i.completionTime)
          yield c - s).getOrElse(-1L)
        stageMs += math.max(ms, 0)
        buf.synchronized {
          buf += f"stage ${i.stageId}%4d wall=${ms}%6d ms tasks=${i.numTasks}%3d ${i.name.takeWhile(_ != '\n').take(70)}"
        }
      }
    })
    // warm + stage the index untimed
    graft.SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()
    graft.SparkEntry.stageIndexes(spark, sfDir)
    // one warm pass so codegen/JIT is out of the measurement
    graft.SparkEntry.queries("n23_ann_graph")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    jobs = 0; stages = 0; stageMs = 0; buf.synchronized(buf.clear())
    val t0 = System.nanoTime()
    graft.SparkEntry.queries("n23_ann_graph")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // listener drain
    println(f"WALK wall=$wall%.2f s jobs=$jobs stages=$stages stageWall=${stageMs / 1e3}%.2f s")
    buf.synchronized(buf.toSeq).sortBy(s => -s.split("wall=")(1).trim.split(" ")(0).toLong)
      .take(15).foreach(println)
    graft.SparkEntry.clearCaches(spark)
    spark.stop()
  }
}
