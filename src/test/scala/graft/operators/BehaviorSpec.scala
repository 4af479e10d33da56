package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Behavior-analytics operators against brute-force references on
  * hand-built event streams, including the edge the declarative shape
  * must not fumble: a funnel stage event at EXACTLY the previous
  * stage's timestamp does not count (strict `>`), and a user whose
  * stages arrive out of order never converts. */
class BehaviorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // u1: clean view -> click -> purchase
  // u2: click BEFORE the first view -> funnel stalls at view
  // u3: click at the exact view timestamp -> strict > rejects it, but a
  //     later click counts; no purchase
  // u4: purchase only -> all stages null except none (no view)
  private val events = Seq(
    (1L, ts("2024-01-01 10:00:00"), 10L, "view"),
    (2L, ts("2024-01-01 10:05:00"), 10L, "click"),
    (3L, ts("2024-01-01 10:06:00"), 10L, "purchase"),
    (4L, ts("2024-01-01 09:00:00"), 20L, "click"),
    (5L, ts("2024-01-01 09:30:00"), 20L, "view"),
    (6L, ts("2024-01-02 08:00:00"), 30L, "view"),
    (7L, ts("2024-01-02 08:00:00"), 30L, "click"),
    (8L, ts("2024-01-02 09:00:00"), 30L, "click"),
    (9L, ts("2024-01-03 12:00:00"), 40L, "purchase"))

  private def eventsDf = events.toDF("event_id", "ts", "user_id", "event_type")

  test("funnel: strict ordering, equal-timestamp rejection, stalled users") {
    val got = Behavior.funnel(eventsDf, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getTimestamp(1)), Option(r.getTimestamp(2)),
          Option(r.getTimestamp(3))))).toMap

    assert(got.keySet == Set(10L, 20L, 30L, 40L))
    assert(got(10L) == (Some(ts("2024-01-01 10:00:00")),
      Some(ts("2024-01-01 10:05:00")), Some(ts("2024-01-01 10:06:00"))))
    // u2's click precedes its view: stage 2 never fires
    assert(got(20L) == (Some(ts("2024-01-01 09:30:00")), None, None))
    // u3's same-instant click is rejected (strict >); the later one counts
    assert(got(30L) == (Some(ts("2024-01-02 08:00:00")),
      Some(ts("2024-01-02 09:00:00")), None))
    // u4 never viewed: everything null
    assert(got(40L) == (None, None, None))
  }

  test("funnel matches a brute-force per-user scan on random streams") {
    val rnd = new scala.util.Random(7)
    val types = Seq("view", "click", "purchase", "error")
    val rows = (1 to 400).map { i =>
      (i.toLong, new Timestamp(1700000000000L + rnd.nextInt(1000000) * 1000L),
        (rnd.nextInt(25) + 1).toLong, types(rnd.nextInt(types.size)))
    }
    val df = rows.toDF("event_id", "ts", "user_id", "event_type")
    val stages = Seq("view", "click", "purchase")

    val got = Behavior.funnel(df, "user_id", "ts", "event_type", stages)
      .collect().map(r => r.getLong(0) ->
        (1 to 3).map(i => Option(r.getTimestamp(i)).map(_.getTime))).toMap

    // reference: literal sequential scan per user
    val ref = rows.groupBy(_._3).map { case (u, evs) =>
      var floor = Long.MinValue
      val hits = stages.map { st =>
        val hit = evs.filter(e => e._4 == st && e._2.getTime > floor)
          .map(_._2.getTime).minOption
        floor = hit.getOrElse(Long.MaxValue)
        hit
      }
      u -> hits
    }
    assert(got == ref)
  }

  test("weeklyRetention: cohorts anchor on the first event's week") {
    val got = Behavior.weeklyRetention(eventsDf, "user_id", "ts")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // all sample events fall in the week of Mon 2024-01-01
    assert(got == Map(("2024-01-01", 0L) -> 4L))

    // u10 reappearing two weeks later lands in offset 2, not 1
    val later = eventsDf.union(
      Seq((99L, ts("2024-01-16 10:00:00"), 10L, "view"))
        .toDF("event_id", "ts", "user_id", "event_type"))
    val got2 = Behavior.weeklyRetention(later, "user_id", "ts")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got2 == Map(("2024-01-01", 0L) -> 4L, ("2024-01-01", 2L) -> 1L))
  }

  test("transitionMatrix: counts and row-normalized probabilities") {
    val got = Behavior.transitionMatrix(eventsDf, "user_id", "ts",
      "event_type", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap

    // u1: view->click->purchase; u2: click->view; u3: view->click (the
    // same-ts pair orders by event_id), click->click; u4: no steps
    assert(got(("view", "click")) == (2L, 1.0))
    assert(got(("click", "purchase")) == (1L, 0.333333))
    assert(got(("click", "view")) == (1L, 0.333333))
    assert(got(("click", "click")) == (1L, 0.333333))
    assert(got.size == 4)
    // probabilities per prev row sum to ~1 (each rounded to 6 places)
    val rowSums = got.toSeq.groupBy(_._1._1)
      .view.mapValues(_.map(_._2._2).sum).toMap
    rowSums.values.foreach(s => assert(math.abs(s - 1.0) < 1e-5))
  }
  test("associationRules: hand-countable baskets") {
    // baskets: {m,b}, {m,b,e}, {m}, {e} -> nB=4
    // n_m=3, n_b=2, n_e=2; joint: m,b=2; m,e=1; b,e=1 (each direction)
    val df = Seq(
      (1L, "milk"), (1L, "bread"),
      (2L, "milk"), (2L, "bread"), (2L, "eggs"),
      (3L, "milk"), (4L, "eggs"),
      (2L, "milk") // duplicate observation collapses
    ).toDF("basket", "item")
    val got = Behavior.associationRules(df, Seq("basket"), "item")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n_joint"), r.getAs[Long]("support_ppm"),
          r.getAs[Long]("confidence_ppm"), r.getAs[Long]("lift_ppm"))))
      .toMap
    assert(got.size == 6)
    // milk -> bread: joint 2, support 2/4, conf 2/3, lift 2*4/(3*2)
    assert(got(("milk", "bread")) ==
      ((2L, 500000L, 666666L, 1333333L)))
    // bread -> milk: conf 2/2 = 1, lift symmetric
    assert(got(("bread", "milk")) ==
      ((2L, 500000L, 1000000L, 1333333L)))
    // milk -> eggs: joint 1, conf 1/3, lift 1*4/(3*2) = 0.666...
    assert(got(("milk", "eggs")) ==
      ((1L, 250000L, 333333L, 666666L)))
    // eggs -> bread: joint 1, conf 1/2, lift 4/(2*2) = 1.0 exactly
    assert(got(("eggs", "bread")) == ((1L, 250000L, 500000L, 1000000L)))
  }

  test("associationRules: single-item baskets widen the denominator only") {
    val df = Seq((1L, "a"), (1L, "b"), (2L, "a"), (3L, "c"))
      .toDF("basket", "item")
    val got = Behavior.associationRules(df, Seq("basket"), "item").collect()
    assert(got.length == 2) // a->b and b->a only
    got.foreach { r =>
      assert(r.getAs[Long]("n_baskets") == 3L)
      assert(r.getAs[Long]("support_ppm") == 333333L)
    }
  }
  test("cohortValue: cells, cumulative payback, per-member denominator") {
    val rows = Seq(
      (10L, ts("2024-01-01 10:00:00"), 10.00),
      (10L, ts("2024-01-09 10:00:00"), 5.00),
      (20L, ts("2024-01-02 10:00:00"), 2.00),
      (30L, ts("2024-01-10 10:00:00"), 7.00)
    ).toDF("user_id", "ts", "value")
    val got = Behavior.cohortValue(rows, "user_id", "ts",
        round(col("value") * 100, 0).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got === Map(
      ("2024-01-01", 0L) -> ((2L, 1200L, 1200L, 600L)),
      ("2024-01-01", 1L) -> ((1L, 500L, 1700L, 850L)),
      ("2024-01-08", 0L) -> ((1L, 700L, 700L, 700L))))
  }

  test("markovEval: argmax model trained before the split scores after it") {
    def ts(m: Int) = new Timestamp(m * 60000L)
    // train steps (t < 100): a->b x2, a->c x1, b->a x1  => model: a->b, b->a
    // eval steps (t >= 100): a->b (hit), a->c (miss), b->a (hit), c->a (unseen prev)
    val rows = Seq(
      (1L, ts(0), 10L, "a"), (1L, ts(1), 11L, "b"), // a->b
      (1L, ts(2), 12L, "a"), (1L, ts(3), 13L, "b"), // b->a, a->b
      (2L, ts(0), 20L, "a"), (2L, ts(1), 21L, "c"), // a->c
      // eval side
      (3L, ts(99), 30L, "a"), (3L, ts(100), 31L, "b"),  // a->b hit
      (3L, ts(101), 32L, "a"), (3L, ts(102), 33L, "c"), // b->a hit, a->c miss
      (4L, ts(100), 40L, "c"), (4L, ts(101), 41L, "a")  // c->a, prev unseen
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Behavior.markovEval(rows, "user_id", "ts", "event_type",
        "event_id", col("ts") >= ts(100))
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_eval"), r.getAs[Long]("n_predicted"),
          r.getAs[Long]("n_correct"), r.getAs[Long]("acc_ppm")))).toMap
    // user 3: step at ts(100) succ b (eval, prev a), ts(101) succ a (eval,
    // prev b), ts(102) succ c (eval, prev a); user 4: ts(101) succ a prev c
    assert(got("a") === ((2L, 2L, 1L, 500000L)))
    assert(got("b") === ((1L, 1L, 1L, 1000000L)))
    assert(got("c") === ((1L, 0L, 0L, 0L)))
    assert(got.size === 3)
  }

  test("markovEval: tie on count breaks to the lexicographically-min type") {
    def ts(m: Int) = new Timestamp(m * 60000L)
    // train: x->b once, x->a once (tie) => model must pick a
    val rows = Seq(
      (1L, ts(0), 1L, "x"), (1L, ts(1), 2L, "b"),
      (2L, ts(0), 3L, "x"), (2L, ts(1), 4L, "a"),
      (5L, ts(100), 9L, "x"), (5L, ts(101), 10L, "a")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Behavior.markovEval(rows, "user_id", "ts", "event_type",
        "event_id", col("ts") >= ts(100)).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_correct")).toMap
    assert(got === Map("x" -> 1L))
  }

  // ---- burstiness ----

  private def burst(gapsMin: Seq[Long]): Option[Long] = {
    // build one key's stream with the given successive gaps (minutes)
    val times = gapsMin.scanLeft(0L)(_ + _ * 60000000L)
    val rows = times.zipWithIndex.map { case (us, i) =>
      ("k", new Timestamp(us / 1000), i.toLong)
    }
    val df = rows.toDF("k", "ts", "eid")
    val r = Behavior.burstiness(df, "k", "ts", "eid").collect()
    assert(r.length === 1 && r(0).getAs[Long]("n_gaps") === gapsMin.size)
    Option(r(0).getAs[java.lang.Long]("disp_ppm")).map(_.toLong)
  }

  test("burstiness: constant gaps -> zero dispersion; undefined at sub-minute") {
    assert(burst(Seq(5L, 5L, 5L, 5L)) === Some(0L))
    assert(burst(Seq(0L, 0L, 0L)) === None) // S = 0: NULL, not 0
  }

  test("burstiness: hand-computed dispersion, bursty beats regular") {
    // gaps 0,10,0,10: n=4 S=20 Q=200; D = (800-400)*1e6/(80) = 5e6
    assert(burst(Seq(0L, 10L, 0L, 10L)) === Some(5000000L))
    // mild jitter 4,6,4,6: n=4 S=20 Q=104; D = (416-400)*1e6/80 = 2e5
    assert(burst(Seq(4L, 6L, 4L, 6L)) === Some(200000L))
  }

  test("burstiness matches a driver-side replay on random gaps") {
    val rnd = new scala.util.Random(23)
    val gaps = (0 until 50).map(_ => rnd.nextInt(30).toLong)
    val n = gaps.size.toLong
    val s = gaps.sum
    val q = gaps.map(d => d * d).sum
    assert(burst(gaps) === Some((n * q - s * s) * 1000000L / (n * s)))
  }

  // ---- kmTable ----

  private def km(subjects: Seq[(Long, Boolean)]): Seq[(Long, Long, Long, Long)] = {
    val df = subjects.toDF("dur", "obs")
    Behavior.kmTable(df, "dur", "obs").orderBy("t").collect()
      .map(r => (r.getAs[Long]("t"), r.getAs[Long]("n_risk"),
        r.getAs[Long]("n_events"), r.getAs[Long]("n_censored"))).toSeq
  }

  test("kmTable: hand-computed life table with interleaved censoring") {
    val subjects = Seq(6L -> true, 6L -> true, 6L -> true, 6L -> false,
      7L -> true, 9L -> false, 10L -> true, 10L -> false, 11L -> false,
      13L -> true)
    // rows only at EVENT times; same-time censorings still at risk;
    // pure-censoring times (9, 11) shrink later risk sets silently
    assert(km(subjects) === Seq(
      (6L, 10L, 3L, 1L), (7L, 6L, 1L, 0L), (10L, 4L, 1L, 1L),
      (13L, 1L, 1L, 0L)))
  }

  test("kmTable: no censoring -> risk telescopes by event counts") {
    val got = km(Seq(1L -> true, 1L -> true, 3L -> true, 5L -> true))
    assert(got === Seq((1L, 4L, 2L, 0L), (3L, 2L, 1L, 0L), (5L, 1L, 1L, 0L)))
  }

  test("kmTable: all censored -> empty table") {
    assert(km(Seq(2L -> false, 4L -> false)).isEmpty)
  }

  test("kmTable matches a driver-side replay on a random cohort") {
    val rnd = new scala.util.Random(7)
    val subjects = (0 until 200)
      .map(_ => (rnd.nextInt(15).toLong, rnd.nextBoolean()))
    val byDur = subjects.groupBy(_._1)
    val expected = byDur.keys.toSeq.sorted
      .map { t =>
        val ev = byDur(t).count(_._2).toLong
        val cen = byDur(t).count(!_._2).toLong
        val risk = subjects.count(_._1 >= t).toLong
        (t, risk, ev, cen)
      }
      .filter(_._3 > 0)
    assert(km(subjects) === expected)
  }
}
