package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.Parameters

import graft.TestSpark

/** Property invariants for the round-8 analytics gates whose only other
  * pin is the oracle hash: winsorization, MAD outliers, CUSUM drift,
  * and bigram novelty, each checked against an independent driver-side
  * reference over random inputs (the gates pin ONE corpus; these pin
  * the semantics).
  */
object AnalyticsProps extends Properties("analytics") {

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val genVals: Gen[List[Long]] =
    Gen.chooseNum(8, 60).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 50000L)))

  /** Exact linear-interpolated percentile (the percentile/quantile_cont
    * definition both engines implement). */
  private def pct(sorted: IndexedSeq[Double], p: Double): Double = {
    val idx = p * (sorted.size - 1)
    val lo = idx.toInt
    val frac = idx - lo
    if (lo + 1 >= sorted.size) sorted(lo)
    else sorted(lo) + frac * (sorted(lo + 1) - sorted(lo))
  }

  property("winsorize: clamped into rounded [p05, p95]; interior values untouched") =
    forAll(genVals) { vals =>
      val sorted = vals.sorted.map(_.toDouble).toIndexedSeq
      val lo = math.round(pct(sorted, 0.05))
      val hi = math.round(pct(sorted, 0.95))
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, "t", v) }
        .toDF("id", "event_type", "v_c")
      val bounds = df.groupBy("event_type").agg(
        round(expr("percentile(v_c, 0.05)"), 0).cast("long").as("lo_c"),
        round(expr("percentile(v_c, 0.95)"), 0).cast("long").as("hi_c"))
      val got = df.join(broadcast(bounds), Seq("event_type"))
        .select(col("id"),
          least(greatest(col("v_c"), col("lo_c")), col("hi_c")).as("wv"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      vals.zipWithIndex.forall { case (v, i) =>
        got(i.toLong) == math.min(math.max(v, lo), hi)
      }
    }

  property("MAD outliers: flag set equals the brute-force 3xMAD cut") =
    forAll(genVals) { vals =>
      val sorted = vals.sorted.map(_.toDouble).toIndexedSeq
      val med = pct(sorted, 0.5)
      val devs = vals.map(v => math.abs(v - med)).sorted.toIndexedSeq
      val mad = pct(devs, 0.5)
      val expected = vals.zipWithIndex
        .filter { case (v, _) => math.abs(v - med) > mad * 3 }.map(_._2.toLong).toSet
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, "t", v) }
        .toDF("id", "event_type", "v_c")
      val m = df.groupBy("event_type").agg(expr("percentile(v_c, 0.5)").as("med"))
      val dev = df.join(broadcast(m), Seq("event_type"))
        .withColumn("adev", abs(col("v_c") - col("med")))
      val madDf = dev.groupBy("event_type").agg(expr("percentile(adev, 0.5)").as("mad"))
      val got = dev.join(broadcast(madDf), Seq("event_type"))
        .filter(col("adev") > col("mad") * 3)
        .select("id").collect().map(_.getLong(0)).toSet
      got == expected
    }

  property("CUSUM: integer peak deviation equals the brute-force scan") =
    forAll(genVals) { vals =>
      val n = vals.size.toLong
      val s = vals.sum
      val devs = vals.scanLeft(0L)(_ + _).tail.zipWithIndex.map {
        case (pfx, i) => math.abs(n * pfx - (i + 1).toLong * s)
      }
      val expected = devs.max
      val df = vals.zipWithIndex.map { case (v, i) => ("t", i.toLong, v) }
        .toDF("event_type", "k0", "v_c")
      val wc = Window.partitionBy("event_type").orderBy("k0")
      val c = df.withColumn("k", row_number().over(wc).cast("long"))
        .withColumn("pfx", sum(col("v_c")).over(wc))
      val got = c.agg(max(abs(lit(n) * col("pfx") - col("k") * lit(s))))
        .collect()(0).getLong(0)
      got == expected
    }

  property("interleave: the first |sources| positions hit every source once") =
    forAll(Gen.chooseNum(2, 6), Gen.chooseNum(5, 30)) { (nSrc, perSrc) =>
      val docs = (for {
        s <- 0 until nSrc; i <- 0 until perSrc
      } yield ((s * 1000 + i).toLong, s"s$s")).toDF("doc_id", "source")
      val wSrc = Window.partitionBy("source").orderBy(
        md5(concat(lit("il|"), col("doc_id").cast("string"))), col("doc_id"))
      val within = docs.withColumn("pos", row_number().over(wSrc).cast("long"))
      val ranked = GlobalRank.withGlobalRank(within, "rn",
        Seq(col("pos"), col("source"), col("doc_id")))
        .orderBy("rn").collect()
      GlobalRank.clear(spark)
      // every consecutive block of nSrc rows at the same pos level
      // contains each source exactly once (all sources same size here)
      ranked.grouped(nSrc).forall { block =>
        block.map(_.getAs[String]("source")).toSet.size == block.length
      }
    }

  /** Brute-force linear attribution: for each purchase, credit each
    * preceding touch's channel v*1e6*n_c/k by integer division. */
  property("linear attribution equals the per-purchase brute force") =
    forAll(Gen.chooseNum(20, 60)) { n =>
      val types = Seq("click", "view", "signup", "error", "purchase")
      val events = (0 until n).map { i =>
        (1L, i.toLong, types((i * 7919) % types.size), ((i * 131) % 500 + 1).toLong)
      } // (user, order, type, v_c)
      val expected = {
        val credits = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
        val seen = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
        events.foreach { case (_, _, t, v) =>
          if (t == "purchase") {
            val k = seen.values.sum
            if (k > 0) types.init.foreach { c =>
              credits(c) += v * 1000000L * seen(c) / k
            }
          } else seen(t) += 1L
        }
        credits.toMap.filter(_._2 != 0L)
      }
      val df = events.toDF("user_id", "ord", "event_type", "v_c")
      val w = Window.partitionBy("user_id").orderBy("ord")
        .rowsBetween(Window.unboundedPreceding, -1)
      val counted = types.init.foldLeft(df) { (d, c) =>
        d.withColumn(s"__n_$c",
          coalesce(sum(when(col("event_type") === c, 1L)).over(w), lit(0L)))
      }
      val p = counted.filter(col("event_type") === "purchase")
        .withColumn("k", types.init.map(c => col(s"__n_$c")).reduce(_ + _))
        .filter(col("k") > 0)
        .withColumn("v1m", col("v_c") * 1000000L)
      val got = types.init.map(c => p.select(lit(c).as("channel"),
          expr(s"v1m * __n_$c div k").as("credit")))
        .reduce(_ unionByName _)
        .groupBy("channel").agg(sum(col("credit")).as("s"))
        .collect().map(r => r.getString(0) -> r.getLong(1))
        .filter(_._2 != 0L).toMap
      got == expected
    }

  property("novelty: duplicated doc scores zero; unique-vocab doc scores 1e6") =
    forAll(Gen.chooseNum(3, 8)) { nDocs =>
      // doc i = words "w{i}_0 .. w{i}_9" (unique vocab per doc); the
      // last doc duplicates doc 0's text
      val docs = (0 until nDocs).map { i =>
        (i.toLong, (0 until 10).map(j => s"w${i}_$j").mkString(" "))
      } :+ (nDocs.toLong, (0 until 10).map(j => s"w0_$j").mkString(" "))
      val df = docs.toDF("doc_id", "text")
      val bi = df.select(col("doc_id"), explode(array_distinct(
        graft.functions.TextAnalysis.wordShingles(
          graft.functions.TextAnalysis.words(col("text")), 2))).as("sh"))
      val first = bi.groupBy("sh").agg(min(col("doc_id")).as("first_doc"))
      val got = bi.join(first, Seq("sh"))
        .groupBy("doc_id")
        .agg((sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)) * 1000000L
          / count(lit(1))).cast("long").as("ppm"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      (0 until nDocs).forall(i => got(i.toLong) == 1000000L) &&
        got(nDocs.toLong) == 0L
    }
}
