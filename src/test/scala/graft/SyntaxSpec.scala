package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextQuality
import graft.operators.{Dedup, Sessionize}
import graft.syntax._

/** The façade is one-line delegation; these prove the wiring (implicit
  * resolution, argument order, default params) by comparing a
  * representative method per group against the direct library call. */
class SyntaxSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    .select("doc_id", "text", "lang", "source")

  test("dedup + text façades match direct calls") {
    assert(docs.exactDuplicates.collect().toSet ==
      Dedup.exactDuplicates(docs).collect().toSet)
    assert(docs.qualityFilter().collect().toSet ==
      TextQuality.qualityFilter(docs).collect().toSet)
  }

  test("round-5b façades match direct calls") {
    assert(docs.scrubRepeats().collect().toSet ==
      TextQuality.scrubRepeats(docs).collect().toSet)
    assert(docs.regexPretokenize().collect().toSet ==
      TextQuality.regexPretokenize(docs).collect().toSet)
    val bench = docs.filter(col("doc_id") % 7 === 0)
    val train = docs.filter(col("doc_id") % 7 =!= 0)
    assert(train.contaminationAuditBloom(bench, 6).collect().toSet ==
      Dedup.contaminationBloom(train, bench, 6).collect().toSet)
    GraftExtensions.register(spark)
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val scores = graft.operators.Ann.bruteForceScores(emb, col("vec_id") < 3)
    assert(scores.topKPerGroupLocal(Seq("qid"),
        Seq(("cos_r", true), ("neighbor_id", false)), 4).collect().toSet ==
      graft.operators.Ann.topKPerGroupLocal(scores, Seq("qid"),
        Seq(("cos_r", true), ("neighbor_id", false)), 4, "rnk").collect().toSet)
  }

  test("round-7 scrub façades match direct calls") {
    assert(docs.duplicatedSpans().collect().toSet ==
      Dedup.suffixDupSpans(docs).collect().toSet)
    assert(docs.scrubbed().collect().toSet ==
      Dedup.substringScrub(docs).collect().toSet)
    val batch = docs.filter(col("doc_id") % 4 === 0)
    val index = docs.filter(col("doc_id") % 4 =!= 0)
    assert(batch.scrubbedAgainst(index).collect().toSet ==
      Dedup.incrementalScrub(index, batch).collect().toSet)
  }

  test("sessionized façade matches Sessionize") {
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("user_id", "ts")
    assert(events.sessionized(Seq("user_id"), "ts", 1800L).collect().toSet ==
      Sessionize.withSessionId(events, Seq("user_id"), "ts", 1800L).collect().toSet)
  }

  test("round-9 façades match direct calls") {
    import graft.operators.{DataQuality, Retrieval}
    val qt = docs.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("query_id"),
        explode(slice(split(col("text"), " "), 1, 4)).as("word"))
    assert(docs.bm25TopK(qt, 3).collect().toSet ==
      Retrieval.bm25TopK(docs, qt, 3).collect().toSet)
    assert(docs.boilerplateScrubbed(5, 2).collect().toSet ==
      Dedup.boilerplateScrub(docs, 5, 2).collect().toSet)
    val rules = Seq("short" -> (length(col("text")) < 50))
    assert(docs.dqAudit(rules).collect().toSet ==
      DataQuality.audit(docs, rules).collect().toSet)
  }

  test("default PII patterns redact email, ip, and phone with audit counts") {
    import spark.implicits._
    val d = Seq((1L, "mail a.b+c@ex-ample.org ip 192.168.0.1 tel 555-123-4567"),
      (2L, "clean text")).toDF("doc_id", "text")
    val r = d.redact().orderBy("doc_id")
      .select("n_email", "n_ip", "n_phone", "redacted").collect()
    assert(r(0).getLong(0) == 1L && r(0).getLong(1) == 1L && r(0).getLong(2) == 1L)
    assert(r(0).getString(3) == "mail <EMAIL> ip <IP> tel <PHONE>")
    assert(r(1).getString(3) == "clean text")
  }

  test("round-9 session-3 façades match direct calls") {
    import spark.implicits._
    import graft.operators.{Behavior, DataQuality, Intervals, LabelProp,
      Sampling, SeriesStats, SkewSalt, Skyline}
    val iv = Seq(("a", 0L, 10L), ("a", 5L, 20L), ("b", 1L, 2L))
      .toDF("k", "s", "e")
    assert(iv.intervalCoverage(Seq("k"), "s", "e").collect().toSet ==
      Intervals.unionCoverage(iv, Seq("k"), "s", "e").collect().toSet)
    val pts = Seq((1L, 5L), (3L, 3L), (2L, 2L)).toDF("x", "y")
    assert(pts.paretoFrontier("x", "y").collect().toSet ==
      Skyline.frontier2d(pts, "x", "y").collect().toSet)
    val ratings = Seq((true, true), (true, false), (false, false))
      .toDF("a", "b")
    assert(ratings.raterAgreement(col("a"), col("b")).collect().toSet ==
      DataQuality.agreementKappa(ratings, col("a"), col("b"))
        .collect().toSet)
    val basket = Seq((1L, "x"), (1L, "y"), (2L, "x")).toDF("b", "i")
    assert(basket.associationRules(Seq("b"), "i").collect().toSet ==
      Behavior.associationRules(basket, Seq("b"), "i").collect().toSet)
    val series = Seq((0L, 3L), (1L, 9L), (2L, 4L), (3L, 8L)).toDF("t", "x")
    assert(series.autocorr("t", "x", Seq(1)).collect().toSet ==
      SeriesStats.autocorr(series, "t", "x", Seq(1)).collect().toSet)
    val wdf = Seq((1L, 10L), (2L, 90L), (3L, 40L)).toDF("id", "w")
    assert(wdf.prioritySample("id", "w", 2).collect().toSet ==
      Sampling.prioritySample(wdf, "id", "w", 2).collect().toSet)
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    assert(edges.labelCommunities(2).collect().toSet ==
      LabelProp.propagate(edges, 2).collect().toSet)
    val labs = Seq((1L, 1L), (2L, 1L)).toDF("node_id", "label")
    assert(edges.modularity(labs).collect().toSet ==
      LabelProp.modularity(edges, labs).collect().toSet)
    val coords = Seq((1L, 0L, 0L), (2L, 9L, 9L), (3L, 0L, 9L))
      .toDF("id", "x", "y")
    assert(coords.kCenterCoreset("id", Seq("x", "y"), 2).collect().toSet ==
      Sampling.kCenterCoreset(coords, "id", Seq("x", "y"), 2)
        .collect().toSet)
    val truth = Seq((1L, 2L)).toDF("a", "b")
    val candP = Seq((1L, 2L), (1L, 3L)).toDF("a", "b")
    assert(candP.setConfusion(truth, Seq("a", "b")).collect().toSet ==
      DataQuality.setConfusion(candP, truth, Seq("a", "b"))
        .collect().toSet)
    val slotted = (0 until 12).map(i => (i.toLong, i.toLong % 3, 10L + i % 3))
      .toDF("t", "slot", "x")
    assert(slotted.seasonalIndex("t", "x", "slot", 3).collect().toSet ==
      SeriesStats.seasonalIndex(slotted, "t", "x", "slot", 3).collect().toSet)
    assert(slotted.seasonalResiduals("t", "x", "slot", 3).collect().toSet ==
      SeriesStats.seasonalResiduals(slotted, "t", "x", "slot", 3)
        .collect().toSet)
    val skewed = Seq("a", "a", "a", "b").toDF("k")
    assert(skewed.skewAudit(Seq("k"), 2).collect().toSet ==
      SkewSalt.skewAudit(skewed, Seq("k"), 2).collect().toSet)
    val sup = Seq(("a", 5L), ("b", 9L)).toDF("k", "s")
    assert(sup.waterfillAllocation("k", "s", 8L).collect().toSet ==
      Sampling.waterfillAllocation(sup, "k", "s", 8L).collect().toSet)
    val subj = Seq((3L, true), (5L, false)).toDF("dur", "obs")
    assert(subj.kmTable("dur", "obs").collect().toSet ==
      Behavior.kmTable(subj, "dur", "obs").collect().toSet)
    val ts = Seq((0L, 1L), (1L, 3L), (2L, 5L)).toDF("t", "y")
    assert(ts.theilSen("t", "y").collect().toSet ==
      SeriesStats.theilSen(ts, "t", "y").collect().toSet)
    val txt = Seq("alpha beta", "beta gamma").toDF("text")
    assert(txt.textRank("text", 2).collect().toSet ==
      graft.operators.Retrieval.textRank(txt, "text", 2).collect().toSet)
    val wedges = Seq((1L, 2L, 5L), (2L, 3L, 1L)).toDF("src", "dst", "w")
    val srcs = Seq(1L).toDF("id")
    assert(wedges.weightedDistances(srcs, 2).collect().toSet ==
      graft.operators.Bfs.weightedDistances(wedges, srcs, 2).collect().toSet)
    val adocs = Seq((1L, "a b c", "s1")).toDF("doc_id", "text", "source")
    val alloc = Seq(("s1", 2L)).toDF("source", "alloc")
    assert(adocs.tokenBudgetAllocated(alloc).collect().toSet ==
      Sampling.tokenBudgetAllocated(adocs, alloc).collect().toSet)
  }

  test("round-10 façades match direct calls") {
    import spark.implicits._
    import graft.operators.SeriesStats
    val kts = (Seq(("a", 0L, 1L), ("a", 1L, 5L), ("a", 2L, 9L)) ++
      Seq(("b", 0L, 9L), ("b", 1L, 4L), ("b", 2L, 2L)))
      .toDF("k", "t", "y")
    assert(kts.theilSenByKey("k", "t", "y").collect().toSet ==
      SeriesStats.theilSenByKey(kts, "k", "t", "y").collect().toSet)
    val cp = Seq((0L, 2L), (1L, 2L), (2L, 9L), (3L, 9L)).toDF("t", "x")
    assert(cp.changepoint("t", "x").collect().toSet ==
      SeriesStats.changepoint(cp, "t", "x").collect().toSet)
    val kcp = kts.withColumnRenamed("y", "x")
    assert(kcp.changepointByKey("k", "t", "x").collect().toSet ==
      SeriesStats.changepointByKey(kcp, "k", "t", "x").collect().toSet)
    val per = (0 until 24).map(i => (i.toLong, (i % 3).toLong * 4 + 7))
      .toDF("t", "x")
    assert(per.dominantPeriod("t", "x", 2, 6).collect().toSet ==
      SeriesStats.dominantPeriod(per, "t", "x", 2, 6).collect().toSet)
  }
}
