package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Plan pins for the ingest-side timestamp normalization
  * (EventsIngest): the raw nanos feed cannot push time predicates to
  * parquet (the micros cast sits above the scan); after the one-time
  * ingest rewrite, (1) a `ts >=` bound reaches the scan's
  * PushedFilters — row-group stats pruning applies, (2) an
  * `event_date` predicate reaches PartitionFilters — whole
  * directories prune before any file opens, and (3) the rewrite is
  * lossless (same rows, same micros instants, as the raw read). */
class EventsIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sfDir = "/root/testdata/sf0.001"

  private def scans(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan.collectLeaves().collect {
      case f: FileSourceScanExec => f
    }

  test("ts range predicate reaches the normalized scan as a pushed filter") {
    val base = Files.createTempDirectory("graft-ingest-spec").toFile
    try {
      val odir = new java.io.File(base, "events_norm").getPath
      EventsIngest.normalize(spark, sfDir, odir)
      val ev = EventsIngest.scan(spark, odir)

      val cut = ev.agg(min(col("ts"))).head().getTimestamp(0)
      val q = ev.filter(col("ts") > lit(cut)).select("event_id", "ts")

      // (1) the ts bound is IN the scan's pushed data filters — on the
      // raw nanos table the same predicate sits above a projection and
      // never reaches parquet
      val scan = scans(q)
      assert(scan.nonEmpty)
      val pushed = scan.flatMap(_.metadata.get("PushedFilters")).mkString
      assert(pushed.contains("GreaterThan(ts"),
        s"ts bound not pushed to the parquet scan: $pushed")

      // negative control, ONLY when this testdata generation is the
      // TIMESTAMP(NANOS) encoding (reads as LongType before
      // normalizeTs): there the predicate evaluates above the
      // nanos->micros projection and must not reach the scan. Micros
      // regenerations push through the NTZ cast already (UTC session),
      // which is exactly why the ingest rewrite normalizes every
      // encoding to the one layout where pushdown is guaranteed.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val rawSchema = spark.read.parquet(s"$sfDir/events.parquet").schema
      if (rawSchema("ts").dataType ==
          org.apache.spark.sql.types.LongType) {
        val raw = Tables.load(spark, sfDir, "events")
        val rawScan = scans(raw.filter(col("ts") > lit(cut)))
        val rawPushed = rawScan.flatMap(_.metadata.get("PushedFilters")).mkString
        assert(!rawPushed.contains("ts"),
          s"expected NO ts pushdown on the raw nanos scan, got: $rawPushed")
      }
    } finally rm(base)
  }

  test("event_date predicate prunes partitions; rewrite is lossless") {
    val base = Files.createTempDirectory("graft-ingest-spec").toFile
    try {
      val odir = new java.io.File(base, "events_norm").getPath
      EventsIngest.normalize(spark, sfDir, odir)
      val ev = EventsIngest.scan(spark, odir)

      val dates = new java.io.File(odir).listFiles()
        .filter(_.getName.startsWith("event_date=")).map(_.getName).sorted
      assert(dates.length >= 2, s"expected >=2 date partitions, got ${dates.toSeq}")

      val d0 = ev.agg(min(col("event_date"))).head().getDate(0)
      val q = ev.filter(col("event_date") === lit(d0))
      val scan = scans(q)
      assert(scan.nonEmpty && scan.forall(_.partitionFilters.nonEmpty),
        "event_date predicate did not reach the scan as a partition filter")
      // directory pruning actually dropped partitions, not just tagged them
      assert(scan.map(_.selectedPartitions.partitionCount).sum < dates.length,
        "partition pruning selected every partition")

      // (3) lossless: every (event_id, micros instant) survives the
      // rewrite bit-for-bit
      val raw = Tables.load(spark, sfDir, "events")
        .select(col("event_id"), unix_micros(col("ts")).as("us"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val back = ev.select(col("event_id"), unix_micros(col("ts")).as("us"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(back == raw && raw.nonEmpty)
    } finally rm(base)
  }

  private def rm(f: java.io.File): Unit = {
    Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
  }
}
