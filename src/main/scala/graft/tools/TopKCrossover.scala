package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftExtensions
import graft.operators.Ann

/** Measures the declarative two-phase top-k against the custom
  * physical operator ([[graft.plans.LocalTopKPerGroup]]) across input
  * sizes, to locate the crossover where removing the phase-1 full
  * shuffle pays for the operator's per-row (projection + heap) cost.
  * Usage: runMain graft.tools.TopKCrossover [rows...]
  */
object TopKCrossover {

  private def force(df: DataFrame): Double = {
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("topk-crossover")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftExtensions.register(spark)
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq
      else Seq(1000000L, 10000000L, 50000000L, 200000000L)
    val order = Seq(("score", true), ("id", false))
    val ocols = Seq(col("score").desc, col("id"))
    sizes.foreach { n =>
      // 64 groups, pseudo-random scores; 32 input partitions
      val df = spark.range(0, n, 1, 32).select(
        (col("id") % 64).as("gid"), col("id"),
        (hash(col("id")) % 100000).cast("double").as("score"))
      def decl() = force(Ann.topKPerGroup(df, Seq("gid"), ocols, 10, "rnk"))
      def cust() = force(Ann.topKPerGroupLocal(df, Seq("gid"), order, 10, "rnk"))
      decl(); cust() // warm
      val d = Seq.fill(2)(decl()).min
      val c = Seq.fill(2)(cust()).min
      println(f"CROSSOVER rows=$n%d declarative=$d%.2f custom=$c%.2f speedup=${d / c}%.2fx")
    }
    spark.stop()
  }
}
