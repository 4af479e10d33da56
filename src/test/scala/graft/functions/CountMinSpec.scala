package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CountMinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Depth = 4
  private val Width = 32

  private def sketchOf(rows: Seq[Long], partitions: Int): Array[Byte] =
    rows.toDF("x").repartition(partitions)
      .agg(CountMin.build(col("x"), Depth, Width).as("sk"))
      .collect()(0).getAs[Array[Byte]](0)

  test("estimates never undercount and are exact without collisions") {
    // 10 distinct keys in a 4x32 sketch: every key's min-counter row is
    // very likely collision-free, but the guarantee we assert is only
    // the one-sided bound, which holds regardless
    val rows = (1L to 10L).flatMap(k => Seq.fill(k.toInt * 3)(k))
    val sk = sketchOf(rows, 7)
    (1L to 10L).foreach { k =>
      val est = CountMin.estimate(sk, k, Depth, Width)
      assert(est >= k * 3, s"undercount for key $k: $est < ${k * 3}")
    }
    // total mass bound: est <= true + N (degenerate) — tighter check:
    // every estimate is <= N
    val n = rows.size.toLong
    (1L to 10L).foreach { k =>
      assert(CountMin.estimate(sk, k, Depth, Width) <= n)
    }
  }

  test("sketch is independent of partitioning and row order") {
    val rows = (1 to 5000).map(i => (i % 97).toLong)
    val a = sketchOf(rows, 1)
    val b = sketchOf(scala.util.Random.shuffle(rows), 17)
    assert(java.util.Arrays.equals(a, b),
      "pointwise-sum merge must make the sketch order-independent")
  }

  test("forced collisions overestimate, never underestimate") {
    // 200 distinct keys >> 32 buckets: collisions in every row
    val rows = (0L until 200L).flatMap(k => Seq.fill((k % 7 + 1).toInt)(k))
    val truth = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val sk = sketchOf(rows, 8)
    var over = 0
    truth.foreach { case (k, n) =>
      val est = CountMin.estimate(sk, k, Depth, Width)
      assert(est >= n, s"undercount for $k")
      if (est > n) over += 1
    }
    assert(over > 0, "200 keys in 32 buckets must collide somewhere")
  }

  test("inner product estimates join size, one-sided, exact without collisions") {
    // 8 distinct keys in 4x32: near-certainly collision-free per row
    val a = (1L to 8L).flatMap(k => Seq.fill(k.toInt)(k))       // fA(k) = k
    val b = (1L to 8L).flatMap(k => Seq.fill(2 * k.toInt)(k))   // fB(k) = 2k
    val ska = sketchOf(a, 3)
    val skb = sketchOf(b, 5)
    val exact = (1L to 8L).map(k => k * 2 * k).sum
    val est = CountMin.innerProduct(ska, skb, Depth, Width)
    assert(est >= exact, "inner product must never undercount")
    assert(est == exact, "8 keys in 32 buckets should be collision-free here")
    // symmetry
    assert(CountMin.innerProduct(skb, ska, Depth, Width) == est)
  }

  test("inner product of bucket-disjoint streams is 0 (g16 oracle edge)") {
    // Two singleton streams whose keys land in different buckets on
    // every hash row: the estimate must be exactly 0 — and the g16
    // DuckDB oracle's per-row LEFT JOIN + COALESCE(s, 0) yields the
    // same 0 where a plain inner join on (r, bucket) would drop the
    // depth rows entirely (verified by hand on the same fixture).
    val ka = 1L
    val kb = (2L to 1000L).find { cand =>
      (0 until Depth).forall { r =>
        CountMin.bucket(r, ka, Width) != CountMin.bucket(r, cand, Width)
      }
    }.get
    val ska = sketchOf(Seq(ka), 1)
    val skb = sketchOf(Seq(kb), 1)
    assert(CountMin.innerProduct(ska, skb, Depth, Width) == 0L)
  }

  test("probe expression matches the helper through codegen") {
    val rows = (1 to 1000).map(i => (i % 50).toLong)
    val skDf = rows.toDF("x").agg(CountMin.build(col("x"), Depth, Width).as("sk"))
    val got = (0L until 50L).toDF("key")
      .join(broadcast(skDf))
      .select(col("key"), CountMin.estimateCol(col("sk"), col("key"), Depth, Width).as("est"))
      .as[(Long, Long)].collect().toMap
    val sk = skDf.collect()(0).getAs[Array[Byte]](0)
    (0L until 50L).foreach { k =>
      assert(got(k) == CountMin.estimate(sk, k, Depth, Width))
    }
  }
}
