package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Round-17 write-parallelism receipt (VERDICT item 9): `.explain`
  * cannot show writer-side task counts for a dynamic-partition write,
  * so this runs e18_compaction_apply under a
  * `spark.graft.compaction.writeParts` variant and prints every
  * completed stage's task count — the write stage is the one whose
  * task count is the pre-write exchange width (32 pinned vs 1 under
  * AQE's advisory coalescing of a bare repartition(col)).
  * Usage: WriteTaskReceipt <sfDir> <variant: session|bare|N>
  */
object WriteTaskReceipt {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val variant = args(1)
    val spark = SparkSession.builder().master("local[32]")
      .appName("write-task-receipt")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.graft.compaction.writeParts", variant)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.all.foreach(n => graft.Tables.load(spark, dir, n).count())
    // warm once so the receipt pass is the steady-state shape
    graft.SparkEntry.queries("e18_compaction_apply")(spark, dir).count()
    val stages = scala.collection.mutable.ListBuffer[(Int, Int, String)]()
    val l = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        stages += ((i.stageId, i.numTasks, i.name.takeWhile(_ != '\n').take(80)))
      }
    }
    spark.sparkContext.addSparkListener(l)
    graft.SparkEntry.queries("e18_compaction_apply")(spark, dir).count()
    spark.sparkContext.removeSparkListener(l)
    Thread.sleep(500)
    println(s"== variant=$variant: completed stages (id, numTasks, site) ==")
    stages.foreach { case (id, n, name) => println(f"stage=$id%5d tasks=$n%3d  $name") }
    spark.stop()
  }
}
