package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Similarity

/** Measurement receipt for [[graft.functions.GramianAgg]] at
  * production embedding widths (the round-9 ask: the aggregate is
  * gated only at d=8 via n14 — exercise it at d>=64 and record the
  * numbers in SCALE.md).
  *
  * Times the covariance pass two ways over the same synthetic corpus:
  *
  *   - `gramian`: graft.operators.Pca.covariance — one GramianAgg
  *     scan, per-partition buffer of 1 + d + d(d+1)/2 doubles
  *     (d=64 -> ~17 KB, d=256 -> ~260 KB), exchange carries one
  *     buffer per partition.
  *   - `explode`: the round-8 declarative form — every row explodes
  *     its d(d+1)/2 upper-triangle product structs, then an (i,j)
  *     groupBy. Row amplification is d(d+1)/2 x (d=64 -> 2080x,
  *     d=256 -> 32,896x), which is why it is only run at d=64 here
  *     and why the aggregate exists.
  *
  * Also checks the two forms agree (max |diff| over all entries;
  * float summation ORDER differs across partitions, so agreement is
  * ~1e-12 relative, not bitwise — the bitwise pin lives in PcaSpec's
  * single-partition parity test).
  *
  * Run:
  *   java <add-opens> -Xmx24g -cp "target/scala-2.13/classes:/opt/spark/jars/'*'"
  *     graft.tools.GramianWidthReceipt [n] [d]
  */
object GramianWidthReceipt {

  private def corpus(spark: SparkSession, n: Long, d: Int): DataFrame =
    spark.range(n).select(col("id"),
      expr(s"""transform(sequence(0, ${d - 1}),
                 k -> CAST((((id * 37 + k * 17) % 101) - 50) / 7.0 AS DOUBLE))""")
        .as("embedding"))

  /** The round-8 explode-structs covariance formulation — kept as the
    * REFERENCE implementation (this receipt tool and PcaSpec's
    * bit-parity test both use this one definition). */
  def explodeCovariance(em: DataFrame, d: Int): DataFrame = {
    val e = em.select(Similarity.toDoubleArray(col("embedding")).as("e"))
    e.select(explode(expr(
        s"""flatten(transform(sequence(0, ${d - 1}), i ->
              transform(sequence(i, ${d - 1}), j ->
                named_struct('i', CAST(i AS BIGINT), 'j', CAST(j AS BIGINT),
                  'p', e[i] * e[j], 'ei', e[i], 'ej', e[j]))))""")).as("x"))
      .select(col("x.i").as("i"), col("x.j").as("j"), col("x.p").as("p"),
        col("x.ei").as("ei"), col("x.ej").as("ej"))
      .groupBy("i", "j")
      .agg((avg(col("p")) - avg(col("ei")) * avg(col("ej"))).as("cov"))
  }

  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(100000L)
    val d = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("gramian-width-receipt")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val em = corpus(spark, n, d)
    em.write.format("noop").mode("overwrite").save() // warm gen path

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // two timed runs each, keep the min (fork-free local receipt)
    def best(run: () => Unit): Double =
      Seq.fill(2)(time(run())._2).min

    val gramianSec = best(() =>
      graft.operators.Pca.covariance(em, "embedding", d)
        .write.format("noop").mode("overwrite").save())

    val (explodeSec, maxDiff) =
      if (d <= 64) {
        val s = best(() => explodeCovariance(em, d)
          .write.format("noop").mode("overwrite").save())
        val g = graft.operators.Pca.covariance(em, "embedding", d).collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
        val x = explodeCovariance(em, d).collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
        (Some(s), Some(g.map { case (k, v) => math.abs(v - x(k)) }.max))
      } else (None, None)

    val bufBytes = 8L * (1 + d + d.toLong * (d + 1) / 2)
    println(s"""{"metric":"gramian_width","n":$n,"d":$d,""" +
      f""""gramian_sec":$gramianSec%.2f,""" +
      explodeSec.map(s => f""""explode_sec":$s%.2f,""").getOrElse("") +
      maxDiff.map(m => s""""max_abs_diff":$m,""").getOrElse("") +
      s""""buffer_bytes":$bufBytes,""" +
      s""""explode_rows":${n * (d.toLong * (d + 1) / 2)}}""")
    spark.stop()
  }
}
