package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Tables

/** Print row counts of intermediate dedup stages on a dir (diagnostics).
  * Usage: runMain graft.tools.CountProbe [dir] */
object CountProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/graft_heavy_x10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, dir, "documents")
    println(s"PROBE docs=${docs.count()}")
    println(s"PROBE avg_chars=${docs.agg(avg(length(col("text")))).collect()(0).getDouble(0)}")
    val sigs = graft.operators.Dedup.minhashSignatures(docs)
    val pairs = graft.operators.Dedup.lshPairs(sigs)
    println(s"PROBE lsh_pairs=${pairs.count()}")
    spark.stop()
  }
}
