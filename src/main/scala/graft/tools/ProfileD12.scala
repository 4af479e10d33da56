package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextAnalysis
import graft.operators.Dedup

/** Stage decomposition of heavy d12 (longestCommonRuns on the x10
  * near-dup-saturated corpus): volumes first (pairs / candidate docs /
  * gram match points), then marginal stage costs, to locate the
  * bimodal 5-10x CPU swings observed across identical fork runs.
  * Usage: java -cp ... graft.tools.ProfileD12 [heavyDir]
  */
object ProfileD12 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_heavy_x10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String)(f: => Any): Unit = {
      System.gc()
      val t0 = System.nanoTime()
      val r = f
      val tail = r match { case l: Long => f" (n=$l%,d)"; case _ => "" }
      println(f"$label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s$tail")
      Console.out.flush()
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val anchorK = 8
    val docs = Tables.load(spark, dir, "documents")
    docs.count()

    val anchors = Dedup.wordShingles(docs, anchorK).distinct()
    val kept = anchors
      .withColumn("__n", count(lit(1)).over(Window.partitionBy("sh")))
      .filter(col("__n") <= 100).drop("__n")
    val pairs = kept.as("a").join(kept.as("b"), Seq("sh"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      .persist()
    time("pairs (distinct anchor-sharing)")(pairs.count())
    val candDocs = pairs.select(col("doc_a").as("doc_id"))
      .union(pairs.select(col("doc_b").as("doc_id"))).distinct()
    time("candDocs")(candDocs.count())

    val grams = docs.join(broadcast(candDocs), Seq("doc_id"))
      .select(col("doc_id"), posexplode(
        TextAnalysis.wordShingles(TextAnalysis.words(col("text")), anchorK)))
      .withColumnRenamed("col", "g")
    time("positional grams")(grams.count())

    val m = pairs
      .join(grams.select(col("doc_id").as("doc_a"), col("pos").as("i"), col("g")),
        Seq("doc_a"))
      .join(grams.select(col("doc_id").as("doc_b"), col("pos").as("j"), col("g")),
        Seq("doc_b", "g"))
      .select(col("doc_a"), col("doc_b"), col("i"),
        (col("i") - col("j")).as("diag"))
    time("match points")(m.count())

    val wRun = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("i")
    val islands = m.withColumn("__grp", col("i") - row_number().over(wRun))
      .groupBy("doc_a", "doc_b", "diag", "__grp")
      .agg(count(lit(1)).as("starts"))
    time("islands (window + group)")(islands.count())

    time("full d12 (noop write)")(noop(
      Dedup.longestCommonRuns(docs, 8, 12, 100).orderBy("doc_a", "doc_b")))
    time("full d12 again")(noop(
      Dedup.longestCommonRuns(docs, 8, 12, 100).orderBy("doc_a", "doc_b")))

    pairs.unpersist()
    spark.stop()
  }
}
