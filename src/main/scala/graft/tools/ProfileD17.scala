package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup

/** Stage decomposition of heavy d17 (contaminationBloom on the x10
  * contamination-saturated corpus): each step adds one pipeline stage
  * so the per-stage marginal cost falls out of consecutive timings.
  * Usage: java -cp ... graft.tools.ProfileD17 [heavyDir]
  */
object ProfileD17 {
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

    def time(label: String)(f: => Unit): Unit = {
      System.gc()
      val t0 = System.nanoTime()
      f
      println(f"$label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      Console.out.flush()
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = Tables.load(spark, dir, "documents")
    docs.count()
    val train = docs.filter(col("doc_id") % 7 =!= 0)
    val benchmark = docs.filter(col("doc_id") % 7 === 0)
    val k = 6
    val numBits = 1 << 22
    val numHashes = 5

    import graft.functions.Bloom
    val bGrams = Dedup.wordShingles(benchmark, k)
      .select(col("sh"), col("doc_id").as("bench_doc_id")).distinct()
    val bloom = bGrams.agg(Bloom.build(col("sh"), numBits, numHashes).as("bf"))

    time("benchmark grams distinct")(noop(bGrams))
    time("bloom build")(noop(bloom))
    time("train shingles")(noop(Dedup.wordShingles(train, k)))
    val probed = Dedup.wordShingles(train, k)
      .join(broadcast(bloom))
      .filter(Bloom.mightContainCol(col("bf"), col("sh"), numHashes))
      .drop("bf")
    time("+ bloom probe")(noop(probed))
    val survivors = probed.distinct()
    time("+ survivors distinct")(noop(survivors))
    val joined = survivors.join(bGrams, Seq("sh"))
    time("+ verify join")(noop(joined))
    val agged = joined.groupBy("doc_id").agg(
      countDistinct(col("sh")).as("n_overlap_grams"),
      countDistinct(col("bench_doc_id")).as("n_bench_docs"))
    time("+ groupBy 2x countDistinct")(noop(agged))
    time("full d17 (with orderBy)")(noop(
      Dedup.contaminationBloom(train, benchmark, k, numBits = numBits)
        .orderBy("doc_id")))
    println(s"rows: bGrams=${bGrams.count()} probed=${probed.count()} " +
      s"survivors=${survivors.count()} joined=${joined.count()} " +
      s"agged=${agged.count()}")
    spark.stop()
  }
}
