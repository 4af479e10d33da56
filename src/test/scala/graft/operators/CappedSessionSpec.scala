package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The capped-sessionization fold vs a literal driver-side replay of
  * the same recurrence, across many users and partitions — plus the
  * targeted edges: a session split by DURATION with every gap small, a
  * split by GAP alone, and exact-boundary events (strict >) on both
  * predicates. */
class CappedSessionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Long)], gapS: Long, capS: Long) = {
    // (event_id, user, epochMs)
    val df = rows.map { case (id, u, ms) => (id, u, new Timestamp(ms)) }
      .toDF("event_id", "user_id", "ts")
    Sessionize.withCappedSessionId(df, Seq("user_id"), "ts",
      Seq("event_id"), gapS, capS)
      .select("user_id", "event_id", "session_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  private def ref(rows: Seq[(Long, Long, Long)], gapS: Long, capS: Long) =
    rows.groupBy(_._2).flatMap { case (u, evs) =>
      var sid = 0L; var start = 0L; var prev = 0L
      evs.sortBy(e => (e._3, e._1)).map { case (id, _, ms) =>
        if (sid == 0L || ms - prev > gapS * 1000 || ms - start > capS * 1000) {
          sid += 1; start = ms
        }
        prev = ms
        (u, id) -> sid
      }
    }.toMap

  test("matches the driver-side recurrence on random multi-user streams") {
    val rnd = new scala.util.Random(3)
    var t = 0L
    val rows = (1 to 600).map { i =>
      t += rnd.nextInt(120) * 1000L
      (i.toLong, (rnd.nextInt(12) + 1).toLong, t)
    }
    val gapS = 60L
    val capS = 300L
    val got = run(rows, gapS, capS)
    val expected = ref(rows, gapS, capS)
    assert(got == expected)
    // both split causes occur (non-vacuous parameters for this seed)
    val maxSid = got.values.max
    assert(maxSid > 1)
  }

  test("duration cap splits even when every gap is small") {
    // events every 10 s, cap 35 s, gap cap huge: sessions of 4 events
    val rows = (0 until 12).map(i => (i.toLong, 1L, i * 10000L))
    val got = run(rows, 10000L, 35L)
    assert(got.values.max == 3L)
    assert(got((1L, 3L)) == 1L) // t=30 <= 35: still session 1
    assert(got((1L, 4L)) == 2L) // t=40 > 35 from start: split
  }

  test("strict boundaries: exactly-gap and exactly-cap events continue") {
    val rows = Seq(
      (1L, 1L, 0L),
      (2L, 1L, 60000L),  // gap == 60 s exactly: continues
      (3L, 1L, 120000L), // duration == cap 120 s exactly: continues
      (4L, 1L, 120001L)) // 1 ms past the cap: splits
    val got = run(rows, 60L, 120L)
    assert(got((1L, 1L)) == 1L && got((1L, 2L)) == 1L && got((1L, 3L)) == 1L)
    assert(got((1L, 4L)) == 2L)
  }
}
