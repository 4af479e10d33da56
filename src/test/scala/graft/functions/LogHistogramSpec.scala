package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** LogHistogram pinned on: the integer bucket rule's closed forms,
  * the relative-error contract (est <= exact percentile <= est·(1+2^-k)),
  * content determinism under partitioning/merge trees, and the
  * non-negative domain guard. */
class LogHistogramSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val k = 5

  test("bucketFloor: exact below 2^(k+1), top-(k+1)-bits floor above") {
    assert((0L to 63L).forall(v => LogHistogram.bucketFloor(v, k) == v))
    assert(LogHistogram.bucketFloor(64L, k) == 64L)
    assert(LogHistogram.bucketFloor(65L, k) == 64L)
    assert(LogHistogram.bucketFloor(127L, k) == 126L)
    assert(LogHistogram.bucketFloor(1000L, k) == 992L)
    assert(LogHistogram.bucketFloor(Long.MaxValue, k)
      == (Long.MaxValue >> 57) << 57)
    // the relative-error invariant, exhaustively over a wide range
    (1L to 5000L).foreach { v =>
      val lo = LogHistogram.bucketFloor(v, k)
      assert(lo <= v && (v - lo).toDouble / lo <= math.pow(2, -k), s"v=$v")
    }
    intercept[IllegalArgumentException](LogHistogram.bucketFloor(-1L, k))
  }

  // deterministic skewed values (log-uniform-ish), shuffled arrival
  private val values: Seq[Long] =
    (0 until 2000).map(i => 1L + ((i * 2654435761L) % 100000L).abs)

  test("quantile estimates honor est <= exact <= est*(1+2^-k)") {
    val df = values.map(Tuple1(_)).toDF("v").repartition(8)
    val sk = df.agg(LogHistogram.sketch(col("v"), k).as("sk"))
      .select(explode(col("sk")).as("b"))
      .select(col("b.lo").as("lo"), col("b.n").as("n"))
      .orderBy("lo").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(sk.map(_._2).sum == values.size)
    val sorted = values.sorted
    for (pct <- Seq(50, 90, 99)) {
      val rank = (values.size * pct + 99) / 100
      val exact = sorted(rank.toInt - 1)
      var cum = 0L
      val est = sk.collectFirst {
        case (lo, n) if { cum += n; cum >= rank } => lo
      }.get
      assert(est <= exact, s"p$pct est=$est exact=$exact")
      assert(exact <= est + math.max(est >> k, 0L),
        s"p$pct exceeds the bucket width bound: est=$est exact=$exact")
    }
  }

  test("sketch content is identical under any partitioning (merge path)") {
    def content(parts: Int) =
      values.map(Tuple1(_)).toDF("v").repartition(parts)
        .agg(LogHistogram.sketch(col("v"), k).as("sk"))
        .select(to_json(col("sk"))).head().getString(0)
    assert(content(1) == content(13))
  }

  test("weighted sketch: bucket mass = SUM(weight); weight-1 equals the plain sketch") {
    val rows = Seq((100L, 3L), (101L, 2L), (5000L, 7L), (0L, 4L),
      (77L, 0L),            // zero weight: contributes nothing
      (42L, 1L))
    val df = rows.toDF("v", "w").repartition(3)
    val sk = df.agg(LogHistogram.weightedSketch(col("v"), col("w"), k).as("sk"))
      .select(explode(col("sk")).as("b"))
      .select(col("b.lo"), col("b.n")).orderBy("lo")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // expected: bucket per value (all distinct buckets here), mass = w
    val exp = rows.filter(_._2 > 0)
      .map { case (v, w) => LogHistogram.bucketFloor(v, k) -> w }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    assert(sk == exp)
    // weight 1 for every row == the unweighted sketch, bit for bit
    val plain = values.map(Tuple1(_)).toDF("v").repartition(5)
    val a = plain.agg(LogHistogram.sketch(col("v"), k).as("sk"))
      .select(to_json(col("sk"))).head().getString(0)
    val b = plain.select(col("v"), lit(1L).as("w")).repartition(5)
      .agg(LogHistogram.weightedSketch(col("v"), col("w"), k).as("sk"))
      .select(to_json(col("sk"))).head().getString(0)
    assert(a == b)
  }

  test("token-mass quantile diverges from the doc-count quantile on a long tail") {
    // 99 short docs (10 tokens) + 1 huge doc (10000 tokens): the
    // doc-count median is 10, but >90% of the TOKEN MASS sits in the
    // huge doc — the weighted p50 must land in its bucket
    val docs = (Seq.fill(99)(10L) :+ 10000L).map(Tuple1(_)).toDF("nt")
    val sk = docs.agg(LogHistogram
        .weightedSketch(col("nt"), col("nt"), k).as("sk"))
      .select(explode(col("sk")).as("b"))
      .select(col("b.lo"), col("b.n")).orderBy("lo")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val tot = sk.map(_._2).sum
    var cum = 0L
    val p50 = sk.collectFirst {
      case (lo, n) if { cum += n; cum * 2 >= tot } => lo
    }.get
    assert(p50 == LogHistogram.bucketFloor(10000L, k),
      s"token-mass p50 must sit in the huge doc's bucket, got $p50")
  }
}
