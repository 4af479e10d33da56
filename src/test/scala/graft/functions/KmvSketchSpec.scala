package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** KmvSketch pinned on its determinism contract — the sketch IS the k
  * smallest md5 digests, reproducible under any partitioning — plus
  * the estimator paths and the set-operation algebra. */
class KmvSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val K = 16

  private def sketchOf(values: Seq[String], parts: Int): Seq[String] =
    values.toDF("v").repartition(parts)
      .agg(KmvSketch.kmv(col("v"), K).as("sk"))
      .collect()(0).getSeq[String](0)

  private def refSketch(values: Seq[String]): Seq[String] =
    values.distinct.map(KmvSketch.md5Hex).sorted.take(K)

  test("sketch content == k smallest digests, under any partitioning") {
    val vals = (1 to 500).map(i => s"item-$i")
    val ref = refSketch(vals)
    assert(sketchOf(vals, 1) === ref)
    assert(sketchOf(vals, 13) === ref) // exercises the merge path
    assert(ref.length === K && ref === ref.sorted)
  }

  test("duplicates are invisible (distinct semantics)") {
    val vals = (1 to 100).map(i => s"x${i % 20}")
    assert(sketchOf(vals, 7) === refSketch(vals))
    assert(sketchOf(vals, 7).length === 16)
  }

  test("unsaturated sketch holds everything; estimate is exact") {
    val vals = (1 to 9).map(i => s"v$i")
    val df = vals.toDF("v")
      .agg(KmvSketch.kmv(col("v"), K).as("sk"))
      .select(KmvSketch.estimate(col("sk"), K).as("est"),
        size(col("sk")).as("n"))
    val r = df.collect()(0)
    assert(r.getInt(1) === 9)
    assert(r.getLong(0) === 9L)
  }

  test("saturated estimate lands near the truth (KMV error ~ 1/sqrt(k))") {
    val n = 2000
    val est = (1 to n).map(i => s"doc-$i").toDF("v")
      .agg(KmvSketch.kmv(col("v"), 64).as("sk"))
      .select(KmvSketch.estimate(col("sk"), 64).as("est"))
      .collect()(0).getLong(0)
    assert(est > n * 0.6 && est < n * 1.67, s"est=$est for n=$n")
  }

  test("union sketch of two sketches == sketch of the union") {
    val a = (1 to 300).map(i => s"a$i")
    val b = (200 to 500).map(i => s"a$i") // overlap a200..a300
    val df = Seq((a, b)).toDF("a", "b")
      .select(explode(col("a")).as("v")).agg(KmvSketch.kmv(col("v"), K).as("ska"))
      .crossJoin(Seq((b, 1)).toDF("b", "i")
        .select(explode(col("b")).as("v")).agg(KmvSketch.kmv(col("v"), K).as("skb")))
      .select(KmvSketch.unionSketch(col("ska"), col("skb"), K).as("u"))
    val got = df.collect()(0).getSeq[String](0)
    assert(got === refSketch(a ++ b))
  }

  test("intersection estimate tracks the true overlap") {
    def run(a: Seq[String], b: Seq[String]): (Long, Long) = {
      val ska = a.toDF("v").agg(KmvSketch.kmv(col("v"), 64).as("ska"))
      val skb = b.toDF("v").agg(KmvSketch.kmv(col("v"), 64).as("skb"))
      val est = ska.crossJoin(skb)
        .select(KmvSketch.intersectionEstimate(col("ska"), col("skb"), 64)
          .as("i")).collect()(0).getLong(0)
      (est, a.toSet.intersect(b.toSet).size.toLong)
    }
    // heavy overlap: estimate must be well away from zero and near truth
    val (estHi, exactHi) = run((1 to 400).map(i => s"k$i"),
      (101 to 500).map(i => s"k$i"))
    assert(estHi > exactHi / 2 && estHi < exactHi * 2,
      s"est=$estHi exact=$exactHi")
    // disjoint: estimate must be (near) zero
    val (estZero, _) = run((1 to 400).map(i => s"p$i"),
      (1 to 400).map(i => s"q$i"))
    assert(estZero < 40L, s"disjoint est=$estZero")
  }
}
