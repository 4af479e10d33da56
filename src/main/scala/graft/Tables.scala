package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated test tables (TESTDATA.md): one parquet
  * file per table under a scale-factor directory. Reads are plain
  * `spark.read.parquet` scans so Catalyst predicate pushdown / column
  * pruning apply to every downstream query (verify with
  * `.explain("formatted")` — `PushedFilters` / `ReadSchema`).
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Memoized parquet SCHEMA per (session, dir, table) — metadata
    * only, the catalog posture (round 17, VERDICT item 2): a bare
    * `spark.read.parquet` re-infers the schema on EVERY call, and in
    * Spark 4 that inference is a one-task Spark JOB (footer read) —
    * measured at 0.07-0.4 s per gate invocation across the 374-gate
    * bench, the single largest shared slice of the light tier's
    * per-gate floor. A production table lives in a catalog whose
    * schema is pinned metadata; this cache is that posture for the
    * path-read fixtures. No DATA is cached — [[load]] still returns a
    * FRESH DataFrame per call (fresh attribute ids, so two loads of
    * one table keep self-joining exactly as two reads did), and every
    * action still scans the parquet. Dropped per session by
    * [[clear]]. */
  private val schemaCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String), org.apache.spark.sql.types.StructType]

  /** Release a session's memoized schemas (SparkEntry.clearCaches
    * discipline — long test suites build many sessions). */
  def clear(spark: SparkSession): Unit =
    schemaCache.keys.filter(_._1 eq spark).foreach(schemaCache.remove)

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    require(all.contains(name), s"unknown table: $name")
    if (name == "events") {
      // The driver has shipped events.ts under several parquet encodings
      // across regenerations; normalize them all (see normalizeTs).
      // nanosAsLong must be set BEFORE the read for the NANOS encoding.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    val schema = schemaCache.getOrElseUpdate((spark, dir, name),
      spark.read.parquet(s"$dir/$name.parquet").schema)
    val df = spark.read.schema(schema).parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeTs(df) else df
  }

  /** Normalize the `ts` column to a session-local `TimestampType`
    * regardless of which parquet encoding the test-data generator used:
    *
    *  - `TIMESTAMP(NANOS)` + nanosAsLong=true reads as `LongType` nanos →
    *    truncate to micros (same truncation DuckDB applies, so oracle
    *    comparisons agree);
    *  - `TIMESTAMP(MICROS, isAdjustedToUTC=false)` reads as
    *    `TimestampNTZType` → cast to `TimestampType`. The session timezone
    *    is pinned to UTC (SparkSession builder), so the cast is exact —
    *    the wall-clock fields are reinterpreted as UTC instants, which is
    *    what DuckDB does with the same file;
    *  - already-`TimestampType` (e.g. rewritten heavy-tier copies) passes
    *    through.
    *
    * Works on batch AND streaming DataFrames (pure projection). Every
    * reader of `events` — `Tables.load` and the gate-local `readStream`
    * paths — must go through this single choke point so a testdata
    * regeneration can only break one named place.
    */
  def normalizeTs(df: DataFrame): DataFrame =
    if (!df.columns.contains("ts")) df
    else df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
}
