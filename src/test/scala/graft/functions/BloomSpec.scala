package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Dedup

class BloomSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val NumBits = 1 << 14
  private val NumHashes = 5

  private def buildOver(items: Seq[String], partitions: Int): Array[Byte] =
    items.toDF("s").repartition(partitions)
      .agg(Bloom.build(col("s"), NumBits, NumHashes).as("bf"))
      .collect()(0).getAs[Array[Byte]](0)

  test("no false negatives, and build is partition-order independent") {
    val items = (1 to 2000).map(i => s"gram_$i even_${i % 2}")
    val one = buildOver(items, 1)
    val many = buildOver(scala.util.Random.shuffle(items), 13)
    assert(java.util.Arrays.equals(one, many),
      "OR-merge must make the filter independent of partitioning and order")
    val utf8 = org.apache.spark.unsafe.types.UTF8String.fromString _
    items.foreach { it =>
      assert(Bloom.mightContain(one, utf8(it), NumHashes),
        s"false negative for inserted item $it")
    }
  }

  test("false-positive rate is near the analytic bound") {
    val inserted = (1 to 2000).map(i => s"in_$i")
    val bf = buildOver(inserted, 4)
    val utf8 = org.apache.spark.unsafe.types.UTF8String.fromString _
    val probes = (1 to 20000).map(i => s"out_$i")
    val fp = probes.count(p => Bloom.mightContain(bf, utf8(p), NumHashes))
    // n=2000, m=2^14, h=5 -> (1 - e^{-hn/m})^h ~= 0.022; allow 3x slack
    assert(fp.toDouble / probes.size < 0.07,
      s"FP rate ${fp.toDouble / probes.size} far above the analytic ~2.2%")
  }

  test("probe expression matches the helper and survives codegen") {
    val inserted = Seq("alpha beta", "gamma delta", "don't stop")
    val bfDf = inserted.toDF("s")
      .agg(Bloom.build(col("s"), NumBits, NumHashes).as("bf"))
    val probes = (inserted ++ Seq("epsilon zeta", "eta theta")).toDF("p")
    val got = probes.join(broadcast(bfDf))
      .filter(Bloom.mightContainCol(col("bf"), col("p"), NumHashes))
      .select("p").as[String].collect().toSet
    assert(inserted.toSet.subsetOf(got), s"probe lost an inserted item: $got")
  }

  test("contaminationBloom equals exact contamination (sketch moves work, not answers)") {
    // overlapping docs: doc 3i shares a 6-token window with benchmark doc i
    val shared = (1 to 20).map(i => s"shared s$i t$i u$i v$i w$i x$i y$i z$i")
    val docs = (
      (1 to 20).map(i => (i * 3L + 1, s"train noise_$i " + shared(i - 1))) ++
      (1 to 20).map(i => (i * 7919L + 2, s"bench pad_$i " + shared(i - 1))) ++
      (1 to 30).map(i => (i * 13L + 5, s"clean only_$i " + (1 to 12).map(j => s"c${i}_$j").mkString(" ")))
    ).toDF("doc_id", "text")
    val train = docs.filter(col("doc_id") % 2 === 1)
    val bench = docs.filter(col("doc_id") % 2 === 0)
    val exact = Dedup.contamination(train, bench, 6)
      .orderBy("doc_id").collect().map(_.toSeq)
    val bloomed = Dedup.contaminationBloom(train, bench, 6, NumBits, NumHashes)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(exact.nonEmpty, "fixture must actually contaminate")
    assert(bloomed.toSeq == exact.toSeq)
  }

  test("plan pin: probe filter sits below every gram-key exchange") {
    val docs = (1 to 10).map(i => (i.toLong, (1 to 12).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val plan = Dedup.contaminationBloom(
        docs.filter(col("doc_id") % 2 === 1),
        docs.filter(col("doc_id") % 2 === 0), 6, NumBits, NumHashes)
      .queryExecution.executedPlan.toString
    val lines = plan.split("\n")
    val probeLine = lines.indexWhere(_.contains("bloom_might_contain"))
    assert(probeLine >= 0, s"probe expression missing from plan:\n$plan")
    // the invariant: TRAIN-side grams never shuffle unprobed. Track the
    // probe's own gram attribute (e.g. "sh#328") — the benchmark side
    // legitimately shuffles its (small-by-construction) gram set before
    // the filter is even built, under a different attribute id. The
    // zero-shuffle codegen shingler made this distinction load-bearing:
    // the old window shingle form left the benchmark distinct riding
    // its doc_id exchange, so ANY sh# exchange below the probe was a
    // train-side leak; now both sides own their exchanges.
    val probeAttr = "sh#\\d+".r.findFirstIn(lines(probeLine))
      .getOrElse(fail(s"no gram attribute in probe line:\n${lines(probeLine)}"))
    val trainGramExchanges = lines.zipWithIndex.collect {
      case (l, i) if l.contains("Exchange hashpartitioning")
        && l.contains(probeAttr) => i
    }
    assert(trainGramExchanges.nonEmpty,
      s"expected a post-probe train gram exchange in:\n$plan")
    assert(trainGramExchanges.forall(_ < probeLine),
      s"probe must execute before every train-side gram exchange:\n$plan")
  }
}
