package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** SeriesStats.autocorr against an independent driver-side integer
  * replay, plus the semantic anchors: alternating series -> strong
  * negative lag-1, trend -> strong positive lag-1, period-7 signal ->
  * strong lag-7, constant series -> NULL (undefined, not 0). */
class SeriesStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(xs: Seq[Long], lags: Seq[Int]): Map[Long, (Long, Long, Long, Option[Long])] = {
    val df = xs.zipWithIndex.map { case (x, t) => (t.toLong, x) }.toDF("t", "x")
    SeriesStats.autocorr(df, "t", "x", lags).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.getAs[java.lang.Long]("r_ppm")).map(_.toLong)))
    }.toMap
  }

  private def ref(xs: Seq[Long], k: Int): (Long, Long, Option[Long]) = {
    val n = xs.size.toLong
    val s = xs.sum
    val c = xs.map(x => n * x - s)
    val den = c.map(v => v * v).sum
    val num = c.drop(k).zip(c).map { case (a, b) => a * b }.sum
    (num, den, if (den == 0) None else Some(num * 1000000L / den))
  }

  test("matches the driver-side integer replay on an arbitrary series") {
    val xs = Seq(3L, 7L, 2L, 9L, 4L, 4L, 8L, 1L, 6L, 5L, 5L, 2L)
    val got = run(xs, Seq(1, 2, 3))
    for (k <- Seq(1, 2, 3)) {
      val (num, den, r) = ref(xs, k)
      assert(got(k.toLong) === ((xs.size.toLong, num, den, r)), s"lag $k")
    }
  }

  test("alternating series: lag-1 strongly negative, lag-2 strongly positive") {
    val xs = (0 until 40).map(i => if (i % 2 == 0) 10L else 0L)
    val got = run(xs, Seq(1, 2))
    assert(got(1L)._4.get < -900000L)
    assert(got(2L)._4.get > 900000L)
  }

  test("linear trend: lag-1 near +1e6") {
    val xs = (0 until 50).map(_.toLong)
    assert(run(xs, Seq(1))(1L)._4.get > 900000L)
  }

  test("period-7 signal: lag-7 beats lag-3") {
    val xs = (0 until 70).map(i => (i % 7).toLong * 4 + 10)
    val got = run(xs, Seq(3, 7))
    assert(got(7L)._4.get >= 850000L)
    assert(got(3L)._4.get < got(7L)._4.get)
  }

  test("constant series: undefined (NULL), not zero") {
    val got = run(Seq.fill(10)(5L), Seq(1))
    assert(got(1L)._4 === None)
    assert(got(1L)._3 === 0L) // den
  }

  test("lag >= n: zero terms -> num 0") {
    val got = run(Seq(1L, 5L), Seq(3))
    assert(got(3L)._2 === 0L)
  }

  // ---- seasonalIndex ----

  private def runSeasonal(xs: Seq[Long], period: Int): Map[Long, (Long, Long, Long)] = {
    val df = xs.zipWithIndex
      .map { case (x, t) => (t.toLong, t.toLong % period, x) }
      .toDF("t", "slot0", "x")
    SeriesStats.seasonalIndex(df, "t", "x", "slot0", period).collect().map { r =>
      r.getAs[Long]("slot") ->
        ((r.getAs[Long]("n_obs"), r.getAs[Long]("num"), r.getAs[Long]("idx")))
    }.toMap
  }

  private def refSeasonal(xs: Seq[Long], period: Int): Map[Long, (Long, Long, Long)] = {
    val h = (period - 1) / 2
    val rows = (h until xs.size - h).map { t =>
      val d = period.toLong * xs(t) - xs.slice(t - h, t + h + 1).sum
      (t.toLong % period, d)
    }
    rows.groupBy(_._1).map { case (s, vs) =>
      val num = vs.map(_._2).sum
      s -> ((vs.size.toLong, num, num / (period.toLong * vs.size)))
    }
  }

  test("seasonalIndex matches the driver-side integer replay") {
    val xs = Seq(3L, 7L, 2L, 9L, 4L, 4L, 8L, 1L, 6L, 5L, 5L, 2L, 7L, 3L)
    for (p <- Seq(3, 5)) assert(runSeasonal(xs, p) === refSeasonal(xs, p), s"period $p")
  }

  test("seasonalIndex recovers a zero-sum periodic amplitude exactly") {
    // xs = 100 + amp(t % 3), amp = (-6, 0, 6): the centered period-3
    // sum is constant, so d_t = 3*amp and idx = amp per slot, exactly.
    val amp = Seq(-6L, 0L, 6L)
    val xs = (0 until 30).map(t => 100L + amp(t % 3))
    val got = runSeasonal(xs, 3)
    for (s <- 0 until 3) assert(got(s.toLong)._3 === amp(s), s"slot $s")
  }

  test("seasonalIndex: series shorter than the period -> no full window, empty") {
    assert(runSeasonal(Seq(1L, 2L), 3).isEmpty)
  }

  test("seasonalIndexByKey equals per-key seasonalIndex; short keys absent") {
    val a = Seq(3L, 7L, 2L, 9L, 4L, 4L, 8L, 1L, 6L)
    val b = Seq(10L, 12L, 8L, 14L, 9L, 11L, 13L)
    val short = Seq(1L, 2L) // < period: no full window, no rows
    val rows = Seq("a" -> a, "b" -> b, "s" -> short).flatMap {
      case (k, xs) => xs.zipWithIndex.map { case (x, t) =>
        (k, t.toLong, x, (t % 3).toLong) }
    }
    val df = rows.toDF("k", "t", "x", "slot").repartition(5)
    val got = SeriesStats.seasonalIndexByKey(df, "k", "t", "x", "slot", 3)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    def single(xs: Seq[Long]) = SeriesStats.seasonalIndex(
      xs.zipWithIndex.map { case (x, t) => (t.toLong, x, (t % 3).toLong) }
        .toDF("t", "x", "slot"), "t", "x", "slot", 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    for ((k, xs) <- Seq("a" -> a, "b" -> b); (slot, v) <- single(xs))
      assert(got((k, slot)) == v, s"key $k slot $slot")
    assert(!got.keys.exists(_._1 == "s"), "short key must emit nothing")
  }

  test("seasonalIndex rejects even or tiny periods") {
    intercept[IllegalArgumentException](runSeasonal(Seq(1L, 2L, 3L, 4L), 4))
    intercept[IllegalArgumentException](runSeasonal(Seq(1L, 2L, 3L), 1))
  }

  test("seasonalResiduals: res = d - period*idx(slot), rows = full windows only") {
    val xs = Seq(3L, 7L, 2L, 9L, 4L, 4L, 8L, 1L, 6L, 5L, 5L, 2L, 7L, 3L)
    val p = 3
    val df = xs.zipWithIndex
      .map { case (x, t) => (t.toLong, t.toLong % p, x) }
      .toDF("t", "slot0", "x")
    val got = SeriesStats.seasonalResiduals(df, "t", "x", "slot0", p)
      .collect()
      .map(r => r.getAs[Long]("t") ->
        ((r.getAs[Long]("d"), r.getAs[Long]("idx"), r.getAs[Long]("res"))))
      .toMap
    val idx = refSeasonal(xs, p).map { case (s, (_, _, i)) => s -> i }
    val h = (p - 1) / 2
    assert(got.keySet === (h until xs.size - h).map(_.toLong).toSet)
    for ((t, (d, i, res)) <- got) {
      val expD = p.toLong * xs(t.toInt) - xs.slice(t.toInt - h, t.toInt + h + 1).sum
      assert(d === expD, s"t=$t d")
      assert(i === idx(t % p), s"t=$t idx")
      assert(res === expD - p.toLong * idx(t % p), s"t=$t res")
    }
  }

  test("seasonalIndexResume == full rebuild at every split point") {
    val rnd = new scala.util.Random(11)
    val xs = (0 until 25).map(_ => rnd.nextInt(20).toLong)
    val p = 5
    def df(rows: Seq[(Long, Long, Long)]) = rows.toDF("t", "slot0", "x")
    val all = xs.zipWithIndex.map { case (x, t) => (t.toLong, t.toLong % p, x) }
    val full = SeriesStats.seasonalIndex(df(all), "t", "x", "slot0", p)
      .collect().map(_.toSeq).toSet
    for (cut <- Seq(p, 9, 14, 20)) {
      val (part1, part2) = all.splitAt(cut)
      val state = SeriesStats.seasonalIndex(df(part1), "t", "x", "slot0", p)
        .select("slot", "n_obs", "num")
      val carry = df(part1.takeRight(p - 1))
      val resumed = SeriesStats
        .seasonalIndexResume(df(part2), carry, state, "t", "x", "slot0", p)
        .collect().map(_.toSeq).toSet
      assert(resumed === full, s"cut $cut")
    }
  }

  // ---- theilSen ----

  private def runTs(pts: Seq[(Long, Long)]): Option[(Long, Long, Long, Long, Long)] = {
    val df = pts.toDF("t", "y")
    SeriesStats.theilSen(df, "t", "y").collect().headOption
      .map(r => (r.getAs[Long]("n"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("num"), r.getAs[Long]("den"),
        r.getAs[Long]("slope_micros")))
  }

  test("theilSen: exact line recovers its slope; an outlier cannot drag it") {
    // y = 3t: every pairwise slope is 3
    val line = (0L until 10L).map(t => (t, 3 * t))
    val Some((n, np, num, den, sl)) = runTs(line)
    assert(n === 10L && np === 45L && num * 1000000 / den === 3000000L
      && sl === 3000000L)
    // one wild outlier: median slope stays 3 (least squares would not)
    val Some((_, _, num2, den2, _)) =
      runTs(line.updated(5, (5L, 1000000L)))
    assert(num2.toDouble / den2 === 3.0)
  }

  test("theilSen matches a driver-side median-of-slopes replay") {
    val rnd = new scala.util.Random(19)
    val pts = (0 until 12).map(i => (i.toLong * 2, rnd.nextInt(40).toLong))
    val pairs = for {
      i <- pts.indices; j <- pts.indices if j > i
    } yield (pts(j)._2 - pts(i)._2, pts(j)._1 - pts(i)._1)
    val sorted = pairs.sortBy { case (num, den) =>
      (num.toDouble / den, num, den)
    }
    val (num, den) = sorted((sorted.size + 1) / 2 - 1)
    assert(runTs(pts) === Some((12L, sorted.size.toLong, num, den,
      num * 1000000L / den)))
  }

  test("theilSen: fewer than 2 points -> no pairs, empty") {
    assert(runTs(Seq((1L, 5L))).isEmpty)
  }

  private def messageChain(e: Throwable): String =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")

  test("theilSen: past the point bound the plan RAISES, never explodes") {
    val df = (0L until 10L).map(t => (t, 3 * t)).toDF("t", "y")
    val e = intercept[Exception] {
      SeriesStats.theilSen(df, "t", "y", maxPoints = 5).collect()
    }
    assert(messageChain(e).contains("exceeds the 5 in-row pair bound"))
    // at the bound itself it still runs
    assert(SeriesStats.theilSen(df.limit(5), "t", "y", maxPoints = 5)
      .collect().length === 1)
  }

  test("theilSen: duplicate order values RAISE (den=0 pairs), not NULL") {
    val df = Seq((1L, 1L), (1L, 2L), (2L, 3L)).toDF("t", "y")
    val e = intercept[Exception] {
      SeriesStats.theilSen(df, "t", "y").collect()
    }
    assert(messageChain(e).contains("duplicate order values"))
  }

  test("theilSen coarsen=true: a 10x over-bound series estimates within tolerance") {
    // 640 points against a 64-point bound; y = 7t with every 10th
    // point an extreme outlier (+5000) — the bucket medians absorb the
    // outliers and the coarsened Theil-Sen recovers the true slope
    val df = (0L until 640L)
      .map(t => (t, 7 * t + (if (t % 10 == 0) 5000L else 0L)))
      .toDF("t", "y")
    // plain form raises past the bound; coarsen runs
    intercept[Exception] {
      SeriesStats.theilSen(df, "t", "y", maxPoints = 64).collect()
    }
    val r = SeriesStats.theilSen(df, "t", "y", maxPoints = 64,
      coarsen = true).collect().head
    assert(r.getAs[Long]("n") <= 64L) // the bound held post-coarsen
    val slope = r.getAs[Long]("slope_micros")
    assert(math.abs(slope - 7000000L) <= 70000L, s"slope_micros=$slope")
  }

  test("theilSen coarsen=true: identity when a distinct-order series fits the bound") {
    val df = (0L until 9L).map(t => (t, 3 * t + (t % 3))).toDF("t", "y")
    val plain = SeriesStats.theilSen(df, "t", "y").collect().head
    val co = SeriesStats.theilSen(df, "t", "y", coarsen = true)
      .collect().head
    assert(co.toSeq === plain.toSeq)
  }

  test("theilSen coarsen=true: duplicate order values merge to their bucket median") {
    // duplicates raise in the plain form; coarsen aggregates them to
    // one point per order value (the guard message's own prescription)
    val df = Seq((0L, 0L), (1L, 7L), (1L, 9L), (1L, 11L), (2L, 18L))
      .toDF("t", "y")
    val r = SeriesStats.theilSen(df, "t", "y", coarsen = true)
      .collect().head
    // coarsened points: (0,0), (1, 9=median), (2,18) -> slope 9
    assert(r.getAs[Long]("n") === 3L &&
      r.getAs[Long]("slope_micros") === 9000000L)
  }

  test("theilSenByKey coarsen=true: per-key bound, per-key identity") {
    val big = (0L until 200L).map(t => ("big", t, 5 * t))
    val small = (0L until 6L).map(t => ("small", t, 11 * t))
    val df = (big ++ small).toDF("k", "t", "y")
    val got = SeriesStats.theilSenByKey(df, "k", "t", "y", maxPoints = 50,
      coarsen = true).collect()
      .map(r => r.getAs[String]("k") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("slope_micros")))).toMap
    assert(got("big")._1 <= 50L && got("big")._2 === 5000000L)
    // the small key fits the bound -> untouched exact slope
    assert(got("small") === ((6L, 11000000L)))
  }

  test("theilSenByKey equals per-key theilSen; single-point keys absent") {
    val a = (0L until 9L).map(t => ("a", t, 3 * t + (t % 3)))
    val b = (0L until 7L).map(t => ("b", t * 2, 50 - 4 * t))
    val single = Seq(("c", 5L, 9L))
    val df = (a ++ b ++ single).toDF("k", "t", "y")
    val got = SeriesStats.theilSenByKey(df, "k", "t", "y").collect()
      .map(r => r.getAs[String]("k") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_pairs"), r.getAs[Long]("num"),
          r.getAs[Long]("den"), r.getAs[Long]("slope_micros")))).toMap
    assert(got.keySet === Set("a", "b"))
    for ((k, rows) <- Seq("a" -> a, "b" -> b)) {
      val one = SeriesStats.theilSen(
        rows.map { case (_, t, y) => (t, y) }.toDF("t", "y"), "t", "y")
        .collect().head
      assert(got(k) === ((one.getAs[Long]("n"), one.getAs[Long]("n_pairs"),
        one.getAs[Long]("num"), one.getAs[Long]("den"),
        one.getAs[Long]("slope_micros"))), s"key $k")
    }
  }

  test("seasonalResiduals: caller's slot column named 'slot' survives") {
    val amp = Seq(-6L, 0L, 6L)
    val xs = (0 until 30).map(t => 100L + amp(t % 3))
    val df = xs.zipWithIndex
      .map { case (x, t) => (t.toLong, t.toLong % 3, x) }
      .toDF("t", "slot", "x")
    val out = SeriesStats.seasonalResiduals(df, "t", "x", "slot", 3)
    assert(out.columns.count(_ == "slot") === 1)
    val rows = out.select("slot", "res").collect()
    assert(rows.nonEmpty && rows.forall(_.getLong(1) === 0L))
    assert(rows.map(_.getLong(0)).toSet === Set(0L, 1L, 2L))
  }

  // ---- changepoint ----

  private def runCp(xs: Seq[Long]): (Long, Long, Long, Long) = {
    val df = xs.zipWithIndex.map { case (x, t) => (t.toLong, x) }.toDF("t", "x")
    val r = SeriesStats.changepoint(df, "t", "x").collect().head
    (r.getAs[Long]("n"), r.getAs[Long]("t"), r.getAs[Long]("cusum"),
      r.getAs[Long]("abs_cusum"))
  }

  test("changepoint: a clean step lands exactly on the last pre-shift point") {
    // 10 at t=0..11, 20 at t=12..29: the |CUSUM| max is at t=11
    val xs = (0 until 30).map(t => if (t < 12) 10L else 20L)
    val (n, t, cusum, _) = runCp(xs)
    assert(n === 30L && t === 11L)
    // CUSUM_11 = sum of 12 centered values; mean*n = S = 12*10+18*20
    val s = xs.sum
    val expected = (0 to 11).map(i => 30L * xs(i) - s).sum
    assert(cusum === expected && cusum < 0) // left segment below mean
  }

  test("changepoint: constant series reports the first point, cusum 0") {
    assert(runCp(Seq.fill(9)(7L)) === ((9L, 0L, 0L, 0L)))
  }

  test("changepoint: duplicate order values RAISE (tie-order-dependent sum)") {
    val df = Seq((1L, 5L), (1L, 9L), (2L, 3L)).toDF("t", "x")
    val e = intercept[Exception] {
      SeriesStats.changepoint(df, "t", "x").collect()
    }
    assert(messageChain(e).contains("duplicate order values"))
    val ek = intercept[Exception] {
      SeriesStats.changepointByKey(
        Seq(("a", 1L, 5L), ("a", 1L, 9L)).toDF("k", "t", "x"),
        "k", "t", "x").collect()
    }
    assert(messageChain(ek).contains("duplicate order values"))
  }

  test("changepoint: NULL order values RAISE with their OWN diagnosis") {
    // round-10 advice: count(*) vs count_distinct alone misreported a
    // NULL order value as "duplicates" (count_distinct skips NULLs)
    val df = Seq((Some(1L), 5L), (None, 9L), (Some(2L), 3L)).toDF("t", "x")
    val e = intercept[Exception] {
      SeriesStats.changepoint(df, "t", "x").collect()
    }
    assert(messageChain(e).contains("NULL order values"))
  }

  test("autocorr/dominantPeriod: duplicate and NULL order values RAISE") {
    // the lag() window has the same tie-order failure class as the
    // cumulative-sum family; round-10 advice left it unguarded
    val dup = Seq((1L, 5L), (1L, 9L), (2L, 3L)).toDF("t", "x")
    val e = intercept[Exception] {
      SeriesStats.autocorr(dup, "t", "x", Seq(1)).collect()
    }
    assert(messageChain(e).contains("duplicate order values"))
    val ed = intercept[Exception] {
      SeriesStats.dominantPeriod(dup, "t", "x", 1, 2).collect()
    }
    assert(messageChain(ed).contains("duplicate order values"))
    val nul = Seq((Some(1L), 5L), (None, 9L), (Some(2L), 3L)).toDF("t", "x")
    val en = intercept[Exception] {
      SeriesStats.autocorr(nul, "t", "x", Seq(1)).collect()
    }
    assert(messageChain(en).contains("NULL order values"))
  }

  // ---- changepoints (greedy binary segmentation) ----

  private def runCps(xs: Seq[Long], k: Int): Seq[(Long, Long, Long)] = {
    val df = xs.zipWithIndex.map { case (x, t) => (t.toLong, x) }.toDF("t", "x")
    SeriesStats.changepoints(df, "t", "x", k).orderBy("step").collect()
      .map(r => (r.getAs[Long]("step"), r.getAs[Long]("t"),
        r.getAs[Long]("abs_cusum")))
  }

  test("changepoints: two clean steps localize EXACTLY, strongest first") {
    // 10 for t=0..9, 60 for t=10..19, 40 for t=20..29: boundaries are
    // the last pre-shift points t=9 and t=19; the +50 step dominates
    val xs = (0 until 30).map(t => if (t < 10) 10L else if (t < 20) 60L
      else 40L)
    val got = runCps(xs, 3)
    assert(got.map(_._2) === Seq(9L, 19L)) // both found, nothing else
    assert(got.map(_._1) === Seq(1L, 2L))  // discovery order = strength
    assert(got(0)._3 > got(1)._3)          // first pick is the stronger
  }

  test("changepoints: clean single step stops after one row at any k") {
    val xs = (0 until 24).map(t => if (t < 7) 5L else 25L)
    val got = runCps(xs, 8)
    assert(got === Seq((1L, 6L, got.head._3)))
  }

  test("changepoints: constant series -> empty (no zero-strength rows)") {
    assert(runCps(Seq.fill(12)(7L), 4).isEmpty)
    assert(runCps(Seq.empty, 2).isEmpty)
  }

  test("changepoints: random series matches a driver-side greedy integer replay") {
    val rng = new scala.util.Random(1123)
    val xs = Seq.fill(40)(rng.nextInt(200).toLong)
    // exact greedy replay in BigInt: per segment compute the CUSUM
    // argmax (ties -> smallest t), pick the global strongest, split
    def segArgmax(pts: Seq[(Long, Long)]): (Long, BigInt, Long) = {
      val n = BigInt(pts.size)
      val s = BigInt(pts.map(_._2).sum)
      var cum = BigInt(0)
      var best: (BigInt, Long, BigInt) = null // (abs, t, cusum)
      pts.sortBy(_._1).foreach { case (t, x) =>
        cum += n * x - s
        val a = cum.abs
        if (best == null || a > best._1 ||
          (a == best._1 && t < best._2)) best = (a, t, cum)
      }
      (best._2, best._3, pts.size.toLong)
    }
    def replay(pts: Seq[(Long, Long)], k: Int): Seq[(Long, Long, Long, Long)] = {
      var bounds = Seq.empty[Long]
      (1 to k).flatMap { step =>
        val segs = pts.groupBy { case (t, _) => bounds.count(_ < t) }
        val picks = segs.values.map(segArgmax)
          .filter { case (_, cusum, _) => cusum != 0 }
        if (picks.isEmpty) None
        else {
          val (t, cusum, n) = picks.maxBy { case (t, c, _) => (c.abs, -t) }
          bounds = bounds :+ t
          Some((step.toLong, n, t, cusum.toLong))
        }
      }
    }
    val df = xs.zipWithIndex.map { case (x, t) => (t.toLong, x) }.toDF("t", "x")
    val got = SeriesStats.changepoints(df, "t", "x", 4).orderBy("step")
      .collect()
      .map(r => (r.getAs[Long]("step"), r.getAs[Long]("n"),
        r.getAs[Long]("t"), r.getAs[Long]("cusum")))
    val want = replay(xs.zipWithIndex.map { case (x, t) => (t.toLong, x) }, 4)
    assert(got.toSeq === want)
  }

  test("changepoints: k=1 equals the single-changepoint locator") {
    val xs = (0 until 30).map(t => if (t < 12) 10L else 20L)
    val (_, t1, cusum, _) = runCp(xs)
    val got = runCps(xs, 1)
    assert(got.size === 1 && got.head._2 === t1 &&
      got.head._3 === math.abs(cusum))
  }

  test("changepointsByKey equals per-key changepoints; constant keys absent") {
    val rng = new scala.util.Random(31)
    val a = (0 until 35).map(t => ("a", t.toLong, rng.nextInt(120).toLong))
    val b = (0 until 25).map(t =>
      ("b", t.toLong, if (t < 11) 10L else 60L))
    val const = (0 until 9).map(t => ("c", t.toLong, 7L))
    val df = (a ++ b ++ const).toDF("k", "t", "x")
    val got = SeriesStats.changepointsByKey(df, "k", "t", "x", 3)
      .orderBy("k", "step").collect()
      .map(r => (r.getAs[String]("k"), r.getAs[Long]("step"),
        r.getAs[Long]("n"), r.getAs[Long]("t"), r.getAs[Long]("cusum"),
        r.getAs[Long]("abs_cusum")))
    assert(!got.exists(_._1 == "c")) // constant key locates nothing
    for ((key, rows) <- Seq("a" -> a, "b" -> b)) {
      val single = SeriesStats.changepoints(
        rows.map { case (_, t, x) => (t, x) }.toDF("t", "x"), "t", "x", 3)
        .orderBy("step").collect()
        .map(r => (key, r.getAs[Long]("step"), r.getAs[Long]("n"),
          r.getAs[Long]("t"), r.getAs[Long]("cusum"),
          r.getAs[Long]("abs_cusum")))
      assert(got.filter(_._1 == key).toSeq === single.toSeq, s"key $key")
    }
  }

  test("changepointsByKey plan: one groupBy exchange, no window, no join") {
    // the fleet-form contract: the whole recursion is in-row, so the
    // plan is scan -> partial agg -> ONE exchange -> final agg ->
    // project/explode — a Window or Join here means the recursion
    // leaked out of the expression
    val df = (0L until 40L).map(i => (i % 4, i, i % 7)).toDF("k", "t", "x")
    val plan = SeriesStats.changepointsByKey(df, "k", "t", "x", 3)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length === 1, plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Join"), plan)
  }

  test("changepointsByKey: duplicate order values RAISE; size bound RAISES") {
    val dup = Seq(("a", 1L, 5L), ("a", 1L, 9L), ("a", 2L, 3L)).toDF("k", "t", "x")
    val e = intercept[Exception] {
      SeriesStats.changepointsByKey(dup, "k", "t", "x", 2).collect()
    }
    assert(messageChain(e).contains("duplicate"))
    val big = (0L until 10L).map(t => ("a", t, t)).toDF("k", "t", "x")
    val eb = intercept[Exception] {
      SeriesStats.changepointsByKey(big, "k", "t", "x", 2, maxPoints = 5)
        .collect()
    }
    assert(messageChain(eb).contains("exceeds the 5 per-key bound"))
  }

  test("dominantPeriodByKey equals per-key dominantPeriod; constant keys absent") {
    val rng = new scala.util.Random(97)
    val p3 = (0 until 30).map(t => ("p3", t.toLong, Seq(5L, 20L, 50L)(t % 3)))
    val noisy = (0 until 40).map(t => ("nz", t.toLong, rng.nextInt(90).toLong))
    val const = (0 until 12).map(t => ("c", t.toLong, 4L))
    val df = (p3 ++ noisy ++ const).toDF("k", "t", "x")
    val got = SeriesStats.dominantPeriodByKey(df, "k", "t", "x", 2, 8)
      .orderBy("k").collect()
      .map(r => (r.getAs[String]("k"), r.getAs[Long]("period"),
        r.getAs[Long]("n"), r.getAs[Long]("num"), r.getAs[Long]("den"),
        r.getAs[Long]("r_ppm")))
    assert(!got.exists(_._1 == "c"))
    assert(got.find(_._1 == "p3").map(_._2) === Some(3L)) // true period
    for ((key, rows) <- Seq("p3" -> p3, "nz" -> noisy)) {
      val single = SeriesStats.dominantPeriod(
        rows.map { case (_, t, x) => (t, x) }.toDF("t", "x"),
        "t", "x", 2, 8).collect().head
      val g = got.find(_._1 == key).get
      assert((g._2, g._3, g._4, g._5, g._6) ===
        ((single.getAs[Long]("period"), single.getAs[Long]("n"),
          single.getAs[Long]("num"), single.getAs[Long]("den"),
          single.getAs[Long]("r_ppm"))), s"key $key")
    }
  }

  test("dominantPeriod: zero-pair lags (lag >= n) can never win the argmax") {
    // n=4 monotone decline: every REAL lag has negative autocorrelation,
    // and lags 4..14 have zero overlapping pairs (num coalesced to 0) —
    // before the round-10 fix one of those won with r_ppm=0
    val df = Seq(9L, 5L, 1L, 0L).zipWithIndex
      .map { case (x, t) => (t.toLong, x) }.toDF("t", "x")
    val got = SeriesStats.dominantPeriod(df, "t", "x", 2, 14).collect()
    assert(got.length === 1)
    assert(got.head.getAs[Long]("period") < 4L)
    assert(got.head.getAs[Long]("r_ppm") < 0L)
  }

  test("changepoint matches a driver-side integer replay on a random series") {
    val rnd = new scala.util.Random(23)
    val xs = (0 until 40).map(_ => rnd.nextInt(100).toLong)
    val n = xs.size.toLong
    val s = xs.sum
    val cusums = xs.scanLeft(0L)((acc, x) => acc + (n * x - s)).drop(1)
    val best = cusums.zipWithIndex
      .maxBy { case (c, i) => (math.abs(c), -i) }
    assert(runCp(xs) === ((n, best._2.toLong, best._1, math.abs(best._1))))
  }

  test("changepointByKey equals per-key changepoint; one-point key reports cusum 0") {
    val a = (0 until 20).map(t => ("a", t.toLong, if (t < 8) 5L else 15L))
    val b = (0 until 15).map(t => ("b", t.toLong, (t % 4).toLong))
    val single = Seq(("c", 3L, 9L))
    val df = (a ++ b ++ single).toDF("k", "t", "x")
    val got = SeriesStats.changepointByKey(df, "k", "t", "x").collect()
      .map(r => r.getAs[String]("k") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("t"), r.getAs[Long]("cusum"),
          r.getAs[Long]("abs_cusum")))).toMap
    assert(got.keySet === Set("a", "b", "c"))
    for ((k, rows) <- Seq("a" -> a, "b" -> b)) {
      val one = SeriesStats.changepoint(
        rows.map { case (_, t, x) => (t, x) }.toDF("t", "x"), "t", "x")
        .collect().head
      assert(got(k) === ((one.getAs[Long]("n"), one.getAs[Long]("t"),
        one.getAs[Long]("cusum"), one.getAs[Long]("abs_cusum"))), s"key $k")
    }
    assert(got("c") === ((1L, 3L, 0L, 0L)))
    assert(got("a")._2 === 7L) // the step key locates the boundary
  }

  test("dominantPeriod finds the true period; constant series -> empty") {
    // clean period-7 signal over 70 points
    val xs = (0 until 70).map(i => 100L + Seq(0L, 8L, -3L, 5L, -9L, 2L, -3L)(i % 7))
    val df = xs.zipWithIndex.map { case (x, t) => (t.toLong, x) }.toDF("t", "x")
    val got = SeriesStats.dominantPeriod(df, "t", "x", 2, 14).collect()
    assert(got.length === 1 && got.head.getAs[Long]("period") === 7L)
    // trend-only series must NOT report lag-1 (excluded by minLag=2)
    val trend = (0 until 50).map(i => (i.toLong, i.toLong * 3)).toDF("t", "x")
    val p = SeriesStats.dominantPeriod(trend, "t", "x", 2, 14).collect()
    assert(p.length === 1 && p.head.getAs[Long]("period") >= 2L)
    val const = Seq.fill(30)(5L).zipWithIndex
      .map { case (x, t) => (t.toLong, x) }.toDF("t", "x")
    assert(SeriesStats.dominantPeriod(const, "t", "x", 2, 14).count() === 0L)
  }

  test("seasonalResiduals: a pure periodic series has zero residuals everywhere") {
    val amp = Seq(-6L, 0L, 6L)
    val xs = (0 until 30).map(t => 100L + amp(t % 3))
    val df = xs.zipWithIndex
      .map { case (x, t) => (t.toLong, t.toLong % 3, x) }
      .toDF("t", "slot0", "x")
    val res = SeriesStats.seasonalResiduals(df, "t", "x", "slot0", 3)
      .select("res").collect().map(_.getLong(0))
    assert(res.nonEmpty && res.forall(_ === 0L))
  }
}
