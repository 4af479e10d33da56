package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.etl.{ActivityPipeline, CleanActivities}
import graft.operators.{Interpolation, TriangularRolling}

/** Stage-level profiler for the flagship pipeline at heavy scale —
  * written to chase the heavy-tier finding that e3 scales ~4x worse
  * than its inputs. Rebuilds the e3 gate inputs (orders/lineitem
  * slices) and times each pipeline stage in isolation.
  * Usage: runMain graft.tools.ProfileE3 [sfDir] [shufflePartitions]
  */
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
    spark.sparkContext.setLogLevel("WARN")
    val now = 1009843200L

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-46s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
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

    time("activities (clean)")(acts().count())
    time("streams (build)")(streams().count())

    val a = acts(); val st = streams()
    val meta = a.select(col("activity_id"), col("elapsed_time"))
    val tagged = st.join(meta, Seq("activity_id"))
    val normal = tagged.filter(col("elapsed_time") < 100000).drop("elapsed_time")
    time("tagged + split (normal count)")(normal.count())

    val spine = normal.groupBy("activity_id")
      .agg(max(col("time")).as("tmax"))
      .select(col("activity_id"),
        explode(sequence(lit(0L), col("tmax"))).as("time_key"))
    time("spine explode")(spine.count())
    val joined = spine.join(
      normal.withColumn("time_key", col("time")),
      Seq("activity_id", "time_key"), "left")
    time("spine join")(joined.count())
    val interp = Interpolation.interpolate(joined, Seq("activity_id"), "time_key",
      graft.etl.StravaSchemas.numericChannels)
      .withColumn("time_new", col("time_key"))
    time("+ interpolate")(interp.count())
    val rolled = TriangularRolling.triangMeansFast(
      interp, Seq("activity_id"), Seq("time_new"),
      Seq("heartrate", "watts", "velocity_smooth"),
      graft.etl.StravaSchemas.rollingWindows)
    time("+ rolling 3x11")(rolled.count())
    time("full process")(
      ActivityPipeline.process(a, st, now).count())
    time("full process (2nd run)")(
      ActivityPipeline.process(a, st, now).count())
    spark.stop()
  }
}
