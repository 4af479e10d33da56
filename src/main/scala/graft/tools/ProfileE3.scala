package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.etl.{ActivityPipeline, CleanActivities, StravaSchemas}
import graft.operators.{Interpolation, TriangularRolling}

/** Stage-level profiler for the flagship pipeline at heavy scale,
  * forcing full evaluation with noop writes (count() lets Catalyst
  * prune aggregates and eliminate left joins — it measures the wrong
  * thing). Usage: runMain graft.tools.ProfileE3 [sfDir] [parts] */
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

    // --- the e3 gate inputs, reproduced ---
    def acts(): DataFrame = {
      val docs = Tables.load(spark, sfDir, "orders").filter(col("o_orderkey") % 20 === 0)
        .select(to_json(struct(
          col("o_orderkey").as("id"),
          col("o_orderpriority").as("name"),
          col("o_orderstatus").as("type"),
          date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("start_date"),
          struct(col("o_custkey").as("id")).as("athlete"),
          (col("o_orderkey") % 86400).as("moving_time"),
          ((col("o_orderkey") % 4000) * 50 + 60).as("elapsed_time"))).as("json"))
      CleanActivities.clean(docs, now.toDouble).filter(col("_valid")).drop("_valid")
    }
    def streams(): DataFrame = {
      val arr = sort_array(collect_list(struct(
        col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity").as("hr"), col("l_extendedprice").as("pr"),
        col("l_discount").as("dc"))))
      Tables.load(spark, sfDir, "lineitem")
        .filter(col("l_orderkey") % 20 === 0)
        .groupBy(col("l_orderkey").as("activity_id")).agg(arr.as("a"))
        .select(col("activity_id"), posexplode(col("a")).as(Seq("idx", "smp")))
        .select(col("activity_id"),
          (col("idx") * 2).cast("long").as("time"),
          array(col("smp.hr"), col("smp.dc")).as("latlng"),
          lit(null).cast("double").as("distance"),
          lit(null).cast("double").as("altitude"),
          round(col("smp.dc") * 10000, 0).as("velocity_smooth"),
          round(col("smp.hr") * 100, 0).as("heartrate"),
          lit(null).cast("double").as("cadence"),
          round(col("smp.pr") * 100, 0).as("watts"),
          lit(null).cast("double").as("temp"),
          lit(true).as("moving"),
          lit(null).cast("double").as("grade_smooth"))
    }

    Tables.load(spark, sfDir, "orders").count(); Tables.load(spark, sfDir, "lineitem").count()
    time("activities (clean)")(acts())
    time("streams (build)")(streams())

    // replicate the pipeline stage by stage (current join-free shape)
    def tagged() = streams().join(
      acts().select(col("activity_id"), col("elapsed_time")), Seq("activity_id"))
      .withColumn("__bypass", col("elapsed_time") >= 100000).drop("elapsed_time")
    time("+ tagged (join)")(tagged())

    def densified() = {
      val t0 = tagged()
      val w = Window.partitionBy("activity_id").orderBy("time")
      val prev = lag(col("time"), 1).over(w)
      val fillStart = when(col("__bypass"), col("time"))
        .otherwise(when(prev.isNull, lit(0L)).otherwise(prev + 1))
      val dataCols = t0.columns.toSeq.filterNot(Set("activity_id", "__bypass").contains)
      val isReal = col("time_key") === col("time")
      t0.withColumn("__fs", least(fillStart, col("time")))
        .withColumn("time_key", explode(sequence(col("__fs"), col("time"))))
        .select(col("activity_id") +: col("__bypass") +: col("time_key") +:
          dataCols.map(c => when(isReal, col(c)).as(c)): _*)
    }
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
