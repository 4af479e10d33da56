package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The z-order layout claim made concrete: Morton-interleave is
  * invertible (so z-cells ARE (x, y) boxes), the codegen expression
  * agrees with plain arithmetic, and range-bucketing by z tightens the
  * per-bucket bounding boxes a parquet footer would carry — the
  * two-dimensional file-skipping win a one-dimensional sort cannot
  * give. */
class MortonSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("interleave/deinterleave round-trips every 8-bit pair") {
    for (x <- 0L until 256L by 7L; y <- 0L until 256L by 11L) {
      val z = Morton.interleave(x, y, 8)
      assert(Morton.deinterleave(z, 8) === (x, y))
    }
    // bit positions: x occupies even bits, y odd
    assert(Morton.interleave(1, 0, 4) === 1L)
    assert(Morton.interleave(0, 1, 4) === 2L)
    assert(Morton.interleave(3, 3, 4) === 15L)
  }

  test("codegen column agrees with the arithmetic formulation") {
    val df = (0 until 500).map(i => (i.toLong % 97, (i * 31).toLong % 89))
      .toDF("x", "y")
    val arith = (0 until 10).map(i =>
      (shiftright(col("x"), i) % 2) * lit(1L << (2 * i)) +
        (shiftright(col("y"), i) % 2) * lit(1L << (2 * i + 1)))
      .reduce(_ + _)
    val bad = df.select(Morton.zorder(col("x"), col("y"), 10).as("z"),
      arith.as("za")).filter(col("z") =!= col("za"))
    assert(bad.count() === 0)
  }

  test("z-range buckets prune y-predicates where an x-sort cannot") {
    // deterministic scatter over a 64x64 grid; both layouts cut the
    // same data into 16 buckets, so bucket SIZES match — the win is
    // that z-buckets carry narrow min/max on BOTH dims, so a filter on
    // y skips most buckets (files), while x-slices span all of y and
    // skip none. This is exactly the parquet-footer skipping decision:
    // a file is read iff pred intersects [min, max].
    val pts = (0 until 4096).map { i =>
      ((i * 2654435761L) % 64, (i * 40503L) % 64)
    }.toDF("x", "y")
    def bucketsReadForY(bucket: org.apache.spark.sql.Column, yLo: Int, yHi: Int): Long =
      pts.withColumn("b", bucket)
        .groupBy("b").agg(min("y").as("y_min"), max("y").as("y_max"))
        .filter(col("y_max") >= yLo && col("y_min") <= yHi)
        .count()
    val zBucket = (Morton.zorder(col("x"), col("y"), 6) / 256).cast("long")
    val xBucket = (col("x") / lit(4)).cast("long")
    val zRead = bucketsReadForY(zBucket, 37, 40)
    val xRead = bucketsReadForY(xBucket, 37, 40)
    assert(xRead === 16L, s"x-slices should span all of y (got $xRead/16)")
    assert(zRead <= 8L, s"z-cells should skip most buckets for a narrow y band (read $zRead/16)")
  }
}
