package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.etl.CleanActivities
import graft.sources.v2.StravaActivitySource

class StravaJsonSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeFixture(): String = {
    val dir = Files.createTempDirectory("strava-fix")
    val acts = Seq(
      """{"id": 1, "name": "A", "type": "Ride", "start_date": "2024-01-01T00:00:00Z", "athlete": {"id": 7}, "total_elevation_gain": 1.0, "distance": 10.0, "moving_time": 60, "elapsed_time": 60, "commute": false}""",
      """{"id": 2, "name": "B", "type": "Ride", "start_date": "2024-01-10T00:00:00Z", "athlete": {"id": 7}, "total_elevation_gain": 2.0, "distance": 20.0, "moving_time": 60, "elapsed_time": 60, "commute": false}""")
    Files.write(dir.resolve("activities.jsonl"),
      acts.mkString("\n").getBytes("UTF-8"))
    dir.resolve("activities.jsonl").toString
  }

  test("incremental activity scan filters on the watermark (S4)") {
    val path = writeFixture()
    val all = StravaJsonSource.activities(spark, path, nowEpoch = 1705000000.0)
    assert(all.count() == 2)
    val after = StravaJsonSource.activities(spark, path, nowEpoch = 1705000000.0,
      afterEpoch = 1704100000L) // between the two activities
    assert(after.select("activity_id").as[Long].collect().toSeq == Seq(2L))
  }

  test("stream channel-dict pivots to long form with null padding (S6/R1)") {
    val dir = Files.createTempDirectory("strava-streams")
    val doc =
      """{"activity_id": 1, "time": [0, 1, 2], "heartrate": [100.0, 110.0, 120.0],
         "latlng": [[1.0, 2.0], [1.1, 2.1], [1.2, 2.2]], "watts": [10.0, 20.0, 30.0]}"""
        .replaceAll("\n\\s*", " ")
    Files.write(dir.resolve("s.json"), doc.getBytes("UTF-8"))
    val got = StravaJsonSource.streams(spark, dir.resolve("s.json").toString)
    assert(got.count() == 3)
    val r1 = got.filter($"time" === 1).collect()(0)
    assert(r1.getAs[Double]("heartrate") == 110.0)
    assert(r1.getSeq[Double](r1.fieldIndex("latlng")).toSeq == Seq(1.1, 2.1))
    assert(r1.isNullAt(r1.fieldIndex("cadence"))) // absent channel -> null pad
  }
}

class StravaSourceV2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeFixture(n: Int): String = {
    val dir = Files.createTempDirectory("strava-v2")
    val lines = (1 to n).map { i =>
      val day = f"${(i % 27) + 1}%02d"
      s"""{"id": $i, "name": "A$i", "type": "Ride", "start_date": "2024-01-${day}T00:00:00Z", "athlete": {"id": 7}, "total_elevation_gain": 1.0, "distance": 10.0, "moving_time": 60, "elapsed_time": 60, "commute": false}"""
    }
    Files.write(dir.resolve("page1.jsonl"), lines.take(n / 2).mkString("\n").getBytes("UTF-8"))
    Files.write(dir.resolve("page2.jsonl"), lines.drop(n / 2).mkString("\n").getBytes("UTF-8"))
    dir.toString
  }

  test("DSv2: watermark predicate is pushed into the source") {
    val dir = writeFixture(10)
    val wm = java.time.Instant.parse("2024-01-05T00:00:00Z").getEpochSecond
    val df = spark.read.format(classOf[StravaActivitySource].getName)
      .option("path", dir).load()
      .filter(col("epoch") > wm)

    // the scan's description must carry the pushed filter — i.e. the
    // source, not Spark, evaluates the watermark (the `after=` semantics)
    val scans = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s
    }
    assert(scans.nonEmpty)
    assert(scans.head.scan.description().contains("GreaterThan(epoch"))

    val expected = (1 to 10).count(i => (i % 27) + 1 > 5)
    assert(df.count() == expected)
  }

  test("DSv2 source composes with CleanActivities (fetch -> clean layering)") {
    val dir = writeFixture(4)
    val raw = spark.read.format(classOf[StravaActivitySource].getName)
      .option("path", dir).load()
    val cleaned = CleanActivities.clean(raw.select("json"), nowEpoch = 1705000000.0)
    assert(cleaned.count() == 4)
    assert(cleaned.select("activity_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    assert(cleaned.filter($"_valid").count() == 4)
  }
}
