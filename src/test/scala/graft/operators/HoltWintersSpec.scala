package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Ewma.holtWinters pinned on the recurrence (driver-side sequential
  * reference across any partitioning), key resets, and the semantic
  * claim that makes it more than Holt: on genuinely seasonal data the
  * seasonal vector LEARNS the per-slot offsets and the level stops
  * oscillating with the season. */
class HoltWintersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val A = 0.5; private val B = 0.25; private val G = 0.25
  private val P = 3

  /** Driver-side reference: the exact recurrence the operator claims. */
  private def reference(vs: Seq[Double]): Seq[(Double, Double, Double)] = {
    var l = 0.0; var b = 0.0; val s = Array.fill(P)(0.0)
    vs.zipWithIndex.map { case (v, i) =>
      val idx = i % P
      if (i == 0) { l = v; b = 0.0 }
      else {
        val sPrev = s(idx)
        val prev = l
        l = A * (v - sPrev) + (1 - A) * (l + b)
        b = B * (l - prev) + (1 - B) * b
        s(idx) = G * (v - l) + (1 - G) * sPrev
      }
      (l, b, s(idx))
    }
  }

  test("matches the sequential reference bitwise, per key, across partitions") {
    val series = Map(
      1L -> Seq(10.0, 14.0, 6.0, 11.0, 15.0, 7.0, 12.0, 16.0, 8.0),
      2L -> Seq(5.0, 5.5, 4.5, 5.25))
    val rows = for {
      (k, vs) <- series.toSeq; (v, i) <- vs.zipWithIndex
    } yield (k, i.toLong, v)
    val df = rows.toDF("key", "ord", "v").repartition(7)
    val got = Ewma.holtWinters(df, Seq("key"), Seq("ord"), "v",
      A, B, G, P, "l", "b", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    for ((k, vs) <- series; ((l, b, s), i) <- reference(vs).zipWithIndex) {
      assert(got((k, i.toLong)) === ((l, b, s)), s"key $k step $i")
    }
  }

  test("seasonal offsets are learned: slot estimates approach the true pattern") {
    // y = 100 + [+9, 0, -9][t mod 3], many cycles, no trend
    val pattern = Seq(9.0, 0.0, -9.0)
    val vs = (0 until 90).map(i => 100.0 + pattern(i % 3))
    val df = vs.zipWithIndex.map { case (v, i) => (1L, i.toLong, v) }
      .toDF("key", "ord", "v")
    val out = Ewma.holtWinters(df, Seq("key"), Seq("ord"), "v",
      A, B, G, P, "l", "b", "s")
      .orderBy("ord").collect()
    // last full cycle: seasonal estimate per slot near the true offset
    val lastCycle = out.takeRight(3)
      .map(r => (r.getLong(1) % 3, r.getDouble(5))).toMap
    for ((slot, want) <- Seq(0L -> 9.0, 1L -> 0.0, 2L -> -9.0)) {
      assert(math.abs(lastCycle(slot) - want) < 1.5,
        s"slot $slot: ${lastCycle(slot)} vs $want")
    }
    // and the level has converged near the base, not oscillating +-9
    val lastLevels = out.takeRight(6).map(_.getDouble(3))
    assert(lastLevels.forall(l => math.abs(l - 100.0) < 3.0), lastLevels.mkString(","))
  }

  test("null values emit carried state without advancing the slot clock") {
    val df = Seq((1L, 0L, Some(10.0)), (1L, 1L, None), (1L, 2L, Some(14.0)))
      .toDF("key", "ord", "v")
    val out = Ewma.holtWinters(df, Seq("key"), Seq("ord"), "v",
      A, B, G, P, "l", "b", "s").orderBy("ord").collect()
    assert(out(1).getDouble(3) === out(0).getDouble(3)) // carried level
    // the null row did not consume slot 1: row 2 is recurrence step 2
    val ref = reference(Seq(10.0, 14.0))
    assert(out(2).getDouble(3) === ref(1)._1)
    assert(out(2).getDouble(5) === ref(1)._3)
  }

  test("holtWintersByKey: per-key final state BIT-equals the per-row form's last row") {
    // a21's parity pin (the a19 pattern): the in-row array fold and the
    // secondary-sort pass must walk the identical IEEE sequence
    val series = Map(
      1L -> Seq(10.0, 14.0, 6.0, 11.0, 15.0, 7.0, 12.0),
      2L -> Seq(5.0, 5.5, 4.5, 5.25),
      3L -> Seq(42.0)) // single point: level=v, trend=0, forecast=v
    val rows = for {
      (k, vs) <- series.toSeq; (v, i) <- vs.zipWithIndex
    } yield (k, i.toLong, v)
    val df = rows.toDF("key", "ord", "v").repartition(5)
    val perRow = Ewma.holtWinters(df, Seq("key"), Seq("ord"), "v",
      A, B, G, P, "l", "b", "s").collect()
      .groupBy(_.getLong(0))
      .map { case (k, rs) => k -> rs.maxBy(_.getLong(1)) }
    val grouped = Ewma.holtWintersByKey(df, Seq("key"), Seq("ord"), "v",
      A, B, G, P).collect()
      .map(r => r.getLong(0) -> r).toMap
    for ((k, vs) <- series) {
      val g = grouped(k)
      val last = perRow(k)
      assert(g.getLong(1) == vs.size, s"key $k n")
      assert(java.lang.Double.doubleToLongBits(g.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(last.getDouble(3)), s"key $k level")
      assert(java.lang.Double.doubleToLongBits(g.getDouble(3)) ==
        java.lang.Double.doubleToLongBits(last.getDouble(4)), s"key $k trend")
      // forecast = level + trend + season[n mod P] — recompute the
      // reference's next-slot seasonal to pin the published forecast
      val (l, b, sArr) = {
        var l0 = 0.0; var b0 = 0.0; val s0 = Array.fill(P)(0.0)
        vs.zipWithIndex.foreach { case (v, i) =>
          val idx = i % P
          if (i == 0) { l0 = v; b0 = 0.0 }
          else {
            val sPrev = s0(idx); val prev = l0
            l0 = A * (v - sPrev) + (1 - A) * (l0 + b0)
            b0 = B * (l0 - prev) + (1 - B) * b0
            s0(idx) = G * (v - l0) + (1 - G) * sPrev
          }
        }
        (l0, b0, s0)
      }
      assert(java.lang.Double.doubleToLongBits(g.getDouble(4)) ==
        java.lang.Double.doubleToLongBits(l + b + sArr(vs.size % P)),
        s"key $k forecast")
    }
  }

  test("holtWintersByKey: nulls are ignore_na; empty key emits n=0 with NULLs") {
    val df = Seq((1L, 0L, Some(10.0)), (1L, 1L, None), (1L, 2L, Some(14.0)),
      (2L, 0L, Option.empty[Double]))
      .toDF("key", "ord", "v")
    val got = Ewma.holtWintersByKey(df, Seq("key"), Seq("ord"), "v",
      A, B, G, P).collect().map(r => r.getLong(0) -> r).toMap
    // key 1: nulls do not advance — final state == reference over the
    // two valid values
    val ref = reference(Seq(10.0, 14.0)).last
    assert(got(1L).getLong(1) == 2L)
    assert(got(1L).getDouble(2) == ref._1)
    // key 2: no valid value -> n=0, NULL level/trend/forecast
    assert(got(2L).getLong(1) == 0L)
    assert(got(2L).isNullAt(2) && got(2L).isNullAt(3) && got(2L).isNullAt(4))
  }

  test("holtWintersByKey: the per-key point bound raises, never explodes") {
    val df = (0 until 40).map(i => (1L, i.toLong, i.toDouble))
      .toDF("key", "ord", "v")
    val e = intercept[Exception] {
      Ewma.holtWintersByKey(df, Seq("key"), Seq("ord"), "v",
        A, B, G, P, maxPoints = 10).collect()
    }
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(chain(e).contains("per-key bound"))
  }
}
