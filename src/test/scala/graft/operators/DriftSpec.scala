package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Drift/PSI pinned on: identical samples score ~0, a genuinely
  * shifted distribution crosses the standard 0.25 action threshold,
  * the metric is symmetric in (ref, cur), and the bucket rule matches
  * LogHistogram.bucketFloor exactly. */
class DriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(vals: Seq[Long]) =
    vals.zipWithIndex.map { case (v, i) => ("g", i.toLong, v) }
      .toDF("grp", "id", "v")

  // log-uniform-ish deterministic sample
  private val base: Seq[Long] =
    (0 until 1000).map(i => 1L + ((i * 2654435761L) % 50000L).abs)

  private def psiOf(a: Seq[Long], b: Seq[Long]): Double =
    Drift.psi(df(a), df(b), Seq("grp"), "v", 5)
      .head().getDouble(4)

  test("identical distributions score near zero; a 4x shift crosses 0.25") {
    val same = psiOf(base, base)
    assert(same >= 0.0 && same < 1e-12, s"identical PSI = $same")
    // disjoint halves of the same corpus: sampling noise at 500/side
    // over ~60 smoothed buckets lands well below the 0.25 action
    // threshold but is NOT zero (the residue sequence has parity
    // structure) — the discrimination claim is halves << shifted
    val (h1, h2) = (base.zipWithIndex.filter(_._2 % 2 == 0).map(_._1),
      base.zipWithIndex.filter(_._2 % 2 == 1).map(_._1))
    val split = psiOf(h1, h2)
    assert(split < 0.25, s"same-distribution halves PSI = $split")
    // a real shift (x4 scales every value two octaves up)
    val shifted = psiOf(base, base.map(_ * 4))
    assert(shifted > 0.25, s"shifted PSI = $shifted")
  }

  test("PSI is symmetric in (ref, cur)") {
    val ab = psiOf(base, base.map(_ * 4))
    val ba = psiOf(base.map(_ * 4), base)
    assert(math.abs(ab - ba) < 1e-9, s"$ab vs $ba")
  }

  test("bucketFloorExpr matches LogHistogram.bucketFloor") {
    val k = 5
    val vals = (0L to 300L) ++ Seq(1000L, 4096L, 99999L, 1L << 40)
    val got = vals.map(Tuple1(_)).toDF("v")
      .select(col("v"), Drift.bucketFloorExpr("v", k).as("lo"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    vals.foreach(v =>
      assert(got(v) == graft.functions.LogHistogram.bucketFloor(v, k), s"v=$v"))
  }
}
