package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md): one parquet
  * file per table under a scale-factor directory. Reads are plain
  * `spark.read.parquet` scans so Catalyst predicate pushdown / column
  * pruning apply to every downstream query (verify with
  * `.explain("formatted")` — `PushedFilters` / `ReadSchema`).
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    require(all.contains(name), s"unknown table: $name")
    if (name == "events") {
      // The driver's events.ts is parquet TIMESTAMP(NANOS), which
      // Spark's vectorized reader rejects. Read nanos as long and
      // truncate to a micros timestamp — the same ns -> us truncation
      // DuckDB applies, so oracle comparisons agree. Re-written copies
      // (e.g. the heavy bench tier) come back as a plain micros
      // timestamp already, so only convert when the column reads long.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
        case _ => df
      }
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }
}
