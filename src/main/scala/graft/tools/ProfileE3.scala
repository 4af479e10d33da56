package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GateFixtures
import graft.etl.{ActivityPipeline, StravaSchemas}
import graft.operators.{Interpolation, TriangularRolling}

/** Stage-level profiler for the flagship pipeline at heavy scale,
  * forcing full evaluation with noop writes (count() lets Catalyst
  * prune aggregates and eliminate left joins — it measures the wrong
  * thing). Drives the REAL fixture builders (GateFixtures) and the
  * REAL pipeline stages (ActivityPipeline.tagStreams/densify) — no
  * copies to drift after the next refactor.
  * Usage: runMain graft.tools.ProfileE3 [sfDir] [parts] */
object ProfileE3 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_heavy_x10")
    val parts = args.lift(1).getOrElse("32")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val now = 1009843200L

    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      force(df)
      println(f"$label%-46s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    def acts(): DataFrame = GateFixtures.e3Activities(spark, sfDir, now)
    def streams(): DataFrame = GateFixtures.e3Streams(spark, sfDir, poisonWatts = false)

    graft.Tables.load(spark, sfDir, "orders").count()
    graft.Tables.load(spark, sfDir, "lineitem").count()
    time("activities (clean)")(acts())
    time("streams (build)")(streams())

    // the real pipeline, stage by stage
    def tagged() = ActivityPipeline.tagStreams(acts(), streams())
    time("+ tagged (join)")(tagged())

    def densified() = ActivityPipeline.densify(tagged())
    time("+ densify (gap fill)")(densified())

    def interp() = Interpolation.interpolate(densified(),
      Seq("activity_id"), "time_key", StravaSchemas.numericChannels,
      passthrough = Some(col("__bypass")))
      .withColumn("time_new", col("time_key"))
    time("+ interpolate")(interp())

    def rolled() = TriangularRolling.triangMeansFast(interp(),
      Seq("activity_id"), Seq("time_new"),
      Seq("heartrate", "watts", "velocity_smooth"), StravaSchemas.rollingWindows)
    time("+ rolling 3x11")(rolled())

    time("full process")(ActivityPipeline.process(acts(), streams(), now))
    time("full e3 gate query")(
      graft.SparkEntry.queries("e3_pipeline_streams")(spark, sfDir))
    spark.stop()
  }
}
