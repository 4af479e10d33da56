package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.functions.TextQuality
import graft.operators._

/** Fluent entry point to the library: `import graft.syntax._` and the
  * operator catalog hangs off the DataFrame itself —
  *
  * {{{
  *   import graft.syntax._
  *   docs.exactDuplicates                     // dedup
  *   docs.qualityFilter().packSequences(2048) // curation
  *   events.sessionized(Seq("user_id"), "ts", gapSeconds = 1800)
  *   trades.asofJoin(quotes, Seq("sym"), "t", "qt", Seq("px" -> "quote_px"))
  * }}}
  *
  * Every method is pure delegation to the library object named in its
  * doc — no logic lives here, so the façade can never drift from the
  * operators (the one-line bodies are the whole contract). Column
  * conventions follow the library: text ops expect (`doc_id`, `text`),
  * embedding ops (`vec_id`, `embedding`), mixing/budget ops a source
  * column.
  */
object syntax {

  implicit class GraftDataFrameOps(private val df: DataFrame) extends AnyVal {

    // ---- sessions / time series ([[operators.Sessionize]], [[operators.Ewma]],
    //      [[operators.Interpolation]], [[operators.AsOfJoin]]) ----

    /** Gap-based session ids per key; see [[Sessionize.withSessionId]]. */
    def sessionized(keys: Seq[String], tsCol: String, gapSeconds: Long): DataFrame =
      Sessionize.withSessionId(df, keys, tsCol, gapSeconds)

    /** Exponentially weighted moving average; see [[Ewma.ewma]]. */
    def ewma(keyCols: Seq[String], orderCols: Seq[String], valueCol: String,
             alpha: Double, outCol: String): DataFrame =
      Ewma.ewma(df, keyCols, orderCols, valueCol, alpha, outCol)

    /** Linear interpolation of null gaps; see [[Interpolation.interpolate]]. */
    def interpolated(partitionCols: Seq[String], orderCol: String,
                     valueCols: Seq[String],
                     passthrough: Option[Column] = None): DataFrame =
      Interpolation.interpolate(df, partitionCols, orderCol, valueCols, passthrough)

    /** As-of join (latest right row at or before the left timestamp);
      * see [[AsOfJoin.asof]]. */
    def asofJoin(right: DataFrame, keys: Seq[String], leftTs: String,
                 rightTs: String, valueCols: Seq[(String, String)],
                 inner: Boolean = true): DataFrame =
      AsOfJoin.asof(df, right, keys, leftTs, rightTs, valueCols, inner)

    // ---- dedup over (doc_id, text) ([[operators.Dedup]]) ----

    /** Exact duplicate groups by content hash; see [[Dedup.exactDuplicates]]. */
    def exactDuplicates: DataFrame = Dedup.exactDuplicates(df)

    /** MinHash signatures; see [[Dedup.minhashSignatures]]. */
    def minhashSignatures: DataFrame = Dedup.minhashSignatures(df)

    /** SimHash 16-bit fingerprints; see [[Dedup.simhash16]]. */
    def simhash: DataFrame = Dedup.simhash16(df)

    /** Cross-doc n-gram dedup stats; see [[Dedup.crossDocGrams]]. */
    def crossDocGrams(k: Int = 8, minDocs: Long = 2L): DataFrame =
      Dedup.crossDocGrams(df, k, minDocs)

    /** Longest shared token runs per candidate pair; see
      * [[Dedup.longestCommonRuns]]. */
    def longestCommonRuns(anchorK: Int = 8, minRun: Int = 12,
                          maxBucket: Int = 100): DataFrame =
      Dedup.longestCommonRuns(df, anchorK, minRun, maxBucket)

    /** Per-doc duplicated-substring spans, full corpus; see
      * [[Dedup.suffixDupSpans]]. */
    def duplicatedSpans(minRun: Int = 12): DataFrame =
      Dedup.suffixDupSpans(df, minRun)

    /** Rewrite docs with duplicated spans removed (corpus-first
      * occurrence kept); see [[Dedup.substringScrub]]. */
    def scrubbed(minRun: Int = 12): DataFrame =
      Dedup.substringScrub(df, minRun)

    /** Scrub this batch against an accepted corpus's gram index; see
      * [[Dedup.incrementalScrub]]. */
    def scrubbedAgainst(indexDocs: DataFrame, minRun: Int = 12): DataFrame =
      Dedup.incrementalScrub(indexDocs, df, minRun)

    /** Benchmark-overlap audit (decontamination); see
      * [[Dedup.contamination]]. */
    def contaminationAudit(benchmark: DataFrame, k: Int = 8): DataFrame =
      Dedup.contamination(df, benchmark, k)

    /** Bloom-prefiltered decontamination (the beyond-broadcast-scale
      * path); see [[Dedup.contaminationBloom]]. */
    def contaminationAuditBloom(benchmark: DataFrame, k: Int = 8,
                                numBits: Int = 1 << 17,
                                numHashes: Int = 5): DataFrame =
      Dedup.contaminationBloom(df, benchmark, k, numBits, numHashes)

    // ---- text curation over (doc_id, text) ([[functions.TextQuality]]) ----

    /** Per-doc quality features; see [[TextQuality.textStats]]. */
    def textStats(stopwords: Seq[String] = TextQuality.defaultStopwords): DataFrame =
      TextQuality.textStats(df, stopwords)

    /** Quality keep-filter; see [[TextQuality.qualityFilter]]. */
    def qualityFilter(minWords: Long = 40L, minTtr: Double = 0.5): DataFrame =
      TextQuality.qualityFilter(df, minWords, minTtr)

    /** n-gram language id; see [[TextQuality.langId]]. */
    def langId: DataFrame = TextQuality.langId(df)

    /** Whitespace + BPE-ish token counts; see [[TextQuality.tokenCounts]]. */
    def tokenCounts: DataFrame = TextQuality.tokenCounts(df)

    /** Winnowing fingerprints; see [[TextQuality.winnowingFingerprints]]. */
    def winnowingFingerprints(gram: Int = 5, win: Int = 4): DataFrame =
      TextQuality.winnowingFingerprints(df, gram, win)

    /** Rational-idf TF-IDF top terms; see [[TextQuality.tfIdfTopTerms]]. */
    def tfIdfTopTerms(k: Int = 3): DataFrame = TextQuality.tfIdfTopTerms(df, k)

    /** Word-bigram LM-style familiarity score; see
      * [[TextQuality.bigramFamiliarity]]. */
    def bigramFamiliarity: DataFrame = TextQuality.bigramFamiliarity(df)

    /** PII redaction with per-pattern audit counts; see [[TextQuality.redact]]. */
    def redact(patterns: Seq[(String, String, String)] =
                 TextQuality.defaultPiiPatterns): DataFrame =
      TextQuality.redact(df, patterns)

    /** Tokenize with a freshly trained BPE tokenizer; see
      * [[TextQuality.bpeTokenize]]. */
    def bpeTokenize(rounds: Int): DataFrame = TextQuality.bpeTokenize(df, rounds)

    /** Per-shard sequence packing; see [[TextQuality.packSequences]]. */
    def packSequences(capacity: Long, shardCol: String = "lang"): DataFrame =
      TextQuality.packSequences(df, capacity, shardCol)

    /** Intra-doc repeated-chunk scrub (Gopher/C4 rule); see
      * [[TextQuality.scrubRepeats]]. */
    def scrubRepeats(chunkWords: Int = 2): DataFrame =
      TextQuality.scrubRepeats(df, chunkWords)

    /** GPT-2-style regex pretokenization class counts; see
      * [[TextQuality.regexPretokenize]]. */
    def regexPretokenize(): DataFrame = TextQuality.regexPretokenize(df)

    // ---- sampling / mixing ([[operators.Sampling]]) ----

    /** Leakage-free grouped train/val/test split; see [[Sampling.groupSplit]]. */
    def groupSplit(groupCol: String, trainMilli: Long = 800L,
                   valMilli: Long = 100L, salt: String = "split"): DataFrame =
      Sampling.groupSplit(df, groupCol, trainMilli, valMilli, salt)

    /** Per-source token budget cap; see [[Sampling.tokenBudget]]. */
    def tokenBudget(budgetTokens: Long, sourceCol: String = "source",
                    salt: String = "tb"): DataFrame =
      Sampling.tokenBudget(df, budgetTokens, sourceCol, salt)

    /** Deterministic weighted up/down-sampling mix; see
      * [[Sampling.weightedMix]]. */
    def weightedMix(milliWeights: Map[String, Long], defaultMilli: Long = 1000L,
                    sourceCol: String = "source", salt: String = "mix"): DataFrame =
      Sampling.weightedMix(df, milliWeights, defaultMilli, sourceCol, salt)

    // ---- ANN over (vec_id, embedding) ([[operators.Ann]]) ----

    /** Brute-force cosine top-k baseline; see [[Ann.bruteForceTopK]]. */
    def annTopK(queryPred: Column, k: Int): DataFrame =
      Ann.bruteForceTopK(df, queryPred, k)

    /** Int8 symmetric quantization of embeddings; see
      * [[Ann.quantizeInt8]]. */
    def quantizeInt8: DataFrame = Ann.quantizeInt8(df)

    /** Top-k over quantized codes (4x-smaller scan); see
      * [[Ann.quantizedTopK]]. */
    def quantizedTopK(queryPred: Column, k: Int): DataFrame =
      Ann.quantizedTopK(df, queryPred, k)

    /** Hotspot-free per-group top-k; see [[Ann.topKPerGroup]]. */
    def topKPerGroup(groupCols: Seq[String], orderCols: Seq[Column], k: Int,
                     rankCol: String = "rnk"): DataFrame =
      Ann.topKPerGroup(df, groupCols, orderCols, k, rankCol)

    /** Per-group top-k through the custom shuffle-free physical phase 1
      * (needs [[GraftExtensions]] registered); see
      * [[Ann.topKPerGroupLocal]]. */
    def topKPerGroupLocal(groupCols: Seq[String],
                          orderKeys: Seq[(String, Boolean)], k: Int,
                          rankCol: String = "rnk"): DataFrame =
      Ann.topKPerGroupLocal(df, groupCols, orderKeys, k, rankCol)

    /** PQ-ADC top-k over sub-codebook codes; see [[Ann.pqTopK]]. */
    def pqTopK(m: Int, subDim: Int, k: Int, iters: Int,
               queryPred: Column, topK: Int): DataFrame =
      Ann.pqTopK(df, m, subDim, k, iters, queryPred, topK)

    /** SemDeDup-shaped semantic drop list against a trained codebook;
      * see [[Dedup.semanticDedup]]. */
    def semanticDedup(centroids: DataFrame, threshold: Double): DataFrame =
      Dedup.semanticDedup(df, centroids, threshold)

    // ---- global ordering ([[operators.GlobalRank]]) ----

    /** Scalable global row numbers (no single-partition window); see
      * [[GlobalRank.withGlobalRank]]. */
    def globalRank(rankCol: String, sortCols: Seq[Column],
                   numPartitions: Option[Int] = None): DataFrame =
      GlobalRank.withGlobalRank(df, rankCol, sortCols, numPartitions)

    // ---- retrieval over (doc_id, text) ([[operators.Retrieval]]) ----

    /** Exact-integer BM25 top-k per query; see [[Retrieval.bm25TopK]]. */
    def bm25TopK(queryTerms: DataFrame, k: Int = 10): DataFrame =
      Retrieval.bm25TopK(df, queryTerms, k)

    /** Reciprocal-rank fusion with another ranked list; see
      * [[Retrieval.rrfFuse]]. */
    def rrfFuse(other: DataFrame, k: Int = 10, c: Long = 60L): DataFrame =
      Retrieval.rrfFuse(df, other, k, c)

    // ---- corpus-frequency scrubs / contamination ([[operators.Dedup]]) ----

    /** Corpus-frequency boilerplate removal; see
      * [[Dedup.boilerplateScrub]]. */
    def boilerplateScrubbed(chunkWords: Int = 10, minDocs: Long = 3L): DataFrame =
      Dedup.boilerplateScrub(df, chunkWords, minDocs)

    /** Per-benchmark-doc contamination vs a training corpus; see
      * [[Dedup.evalContamination]]. */
    def evalContaminationAudit(train: DataFrame, k: Int = 8): DataFrame =
      Dedup.evalContamination(df, train, k)

    /** Hamming-banded fingerprint self-join; see
      * [[Dedup.hammingNeighborJoin]]. */
    def hammingNeighbors(idCol: String, fpCol: String, bits: Int,
                         bands: Int, maxHamming: Int): DataFrame =
      Dedup.hammingNeighborJoin(df, idCol, fpCol, bits, bands, maxHamming)

    // ---- joins ([[operators.AsOfJoin]]) ----

    /** Nearest-in-time join (either direction); see
      * [[AsOfJoin.nearest]]. */
    def nearestJoin(right: DataFrame, keys: Seq[String], leftTs: String,
                    rightTs: String, rightId: String,
                    valueCols: Seq[(String, String)],
                    inner: Boolean = true): DataFrame =
      AsOfJoin.nearest(df, right, keys, leftTs, rightTs, rightId,
        valueCols, inner)

    // ---- evaluation / monitoring ([[operators.Ann]], [[operators.Drift]],
    //      [[operators.DataQuality]], [[operators.KCore]]) ----

    /** Recall@k vs an exact ranked list; see [[Ann.recallAtK]]. */
    def recallAtK(exact: DataFrame, k: Int): DataFrame =
      Ann.recallAtK(df, exact, k)

    /** PSI drift vs a reference snapshot; see [[Drift.psi]]. */
    def psiAgainst(reference: DataFrame, groupCols: Seq[String],
                   valueCol: String, k: Int): DataFrame =
      Drift.psi(reference, df, groupCols, valueCol, k)

    /** One-scan predicate-rule audit; see [[DataQuality.audit]]. */
    def dqAudit(rules: Seq[(String, Column)]): DataFrame =
      DataQuality.audit(df, rules)

    /** k-core peel over a symmetric edge list (src, dst); see
      * [[KCore.corePeel]]. */
    def kCore(k: Int, rounds: Int): DataFrame = KCore.corePeel(df, k, rounds)

    // ---- round-9 session-3: sweeps, frontiers, evals, sampling ----

    /** Per-key union coverage of half-open int64 intervals; see
      * [[Intervals.unionCoverage]]. */
    def intervalCoverage(keys: Seq[String], startCol: String,
                         endCol: String): DataFrame =
      Intervals.unionCoverage(df, keys, startCol, endCol)

    /** 2D Pareto frontier maximizing both columns; see
      * [[Skyline.frontier2d]]. */
    def paretoFrontier(xCol: String, yCol: String,
                       buckets: Int = 32): DataFrame =
      Skyline.frontier2d(df, xCol, yCol, buckets)

    /** Cohen's kappa between two binary raters; see
      * [[DataQuality.agreementKappa]]. */
    def raterAgreement(raterA: Column, raterB: Column): DataFrame =
      DataQuality.agreementKappa(df, raterA, raterB)

    /** Calibration curve of an integer score vs a boolean label; see
      * [[DataQuality.calibrationCurve]]. */
    def calibration(score: Column, label: Column, shift: Long,
                    width: Long): DataFrame =
      DataQuality.calibrationCurve(df, score, label, shift, width)

    /** Depth-2 association rules over (basket, item) rows; see
      * [[Behavior.associationRules]]. */
    def associationRules(basketCols: Seq[String], itemCol: String): DataFrame =
      Behavior.associationRules(df, basketCols, itemCol)

    /** Next-event Markov evaluation under a row-level split; see
      * [[Behavior.markovEval]]. */
    def markovEval(userCol: String, tsCol: String, typeCol: String,
                   tieCol: String, evalSide: Column): DataFrame =
      Behavior.markovEval(df, userCol, tsCol, typeCol, tieCol, evalSide)

    /** Cohort LTV triangle with exact-cents payback; see
      * [[Behavior.cohortValue]]. */
    def cohortValue(userCol: String, tsCol: String,
                    valueCents: Column): DataFrame =
      Behavior.cohortValue(df, userCol, tsCol, valueCents)

    /** Lag-k autocorrelation of an aggregated series; see
      * [[SeriesStats.autocorr]]. */
    def autocorr(orderCol: String, valueCol: String,
                 lags: Seq[Int]): DataFrame =
      SeriesStats.autocorr(df, orderCol, valueCol, lags)

    /** Weighted priority sample of k rows; see
      * [[Sampling.prioritySample]]. */
    def prioritySample(keyCol: String, weightCol: String, k: Int,
                       seed: String = "pri"): DataFrame =
      Sampling.prioritySample(df, keyCol, weightCol, k, seed)

    /** JL random projection to k integer components; see
      * [[Pca.randomProjection]]. */
    def randomProjection(idCol: String, embCol: String, k: Int): DataFrame =
      Pca.randomProjection(df, idCol, embCol, k)

    /** Label-propagation communities over a symmetric edge list; see
      * [[LabelProp.propagate]]. */
    def labelCommunities(rounds: Int): DataFrame =
      LabelProp.propagate(df, rounds)

    /** Modularity of a community assignment; see
      * [[LabelProp.modularity]]. */
    def modularity(labels: DataFrame): DataFrame =
      LabelProp.modularity(df, labels)

    /** Cluster purity against ground-truth labels; see
      * [[Ann.clusterPurity]]. */
    def clusterPurity(labeled: DataFrame, idCol: String = "vec_id",
                      labelCol: String = "label"): DataFrame =
      Ann.clusterPurity(df, labeled, idCol, labelCol)

    /** Energy-gated VAD segments over audio frames; see
      * [[graft.multimodal.Multimodal.vadSegments]]. */
    def vadSegments(threshold: Long): DataFrame =
      graft.multimodal.Multimodal.vadSegments(df, threshold)

    /** Greedy k-center coreset over integer coordinates; see
      * [[Sampling.kCenterCoreset]]. */
    def kCenterCoreset(idCol: String, coordCols: Seq[String],
                       k: Int): DataFrame =
      Sampling.kCenterCoreset(df, idCol, coordCols, k)

    /** MMR diversified re-rank of this candidate list; see
      * [[Ann.mmrRerank]]. */
    def mmrRerank(embeddings: DataFrame, k: Int,
                  lambdaMilli: Int = 700): DataFrame =
      Ann.mmrRerank(df, embeddings, k, lambdaMilli)

    /** Precision/recall/F1 of this key set vs ground truth; see
      * [[DataQuality.setConfusion]]. */
    def setConfusion(truth: DataFrame, keys: Seq[String]): DataFrame =
      DataQuality.setConfusion(df, truth, keys)

    /** Per-slot seasonal index of this ordered series; see
      * [[SeriesStats.seasonalIndex]]. */
    def seasonalIndex(orderCol: String, valueCol: String, slotCol: String,
                      period: Int): DataFrame =
      SeriesStats.seasonalIndex(df, orderCol, valueCol, slotCol, period)

    /** Seasonally-adjusted residuals of this ordered series; see
      * [[SeriesStats.seasonalResiduals]]. */
    def seasonalResiduals(orderCol: String, valueCol: String,
                          slotCol: String, period: Int): DataFrame =
      SeriesStats.seasonalResiduals(df, orderCol, valueCol, slotCol, period)

    /** Exact key-skew report over this table; see
      * [[SkewSalt.skewAudit]]. */
    def skewAudit(keys: Seq[String], topK: Int = 10): DataFrame =
      SkewSalt.skewAudit(df, keys, topK)

    /** Water-filling budget allocation over this per-domain supply
      * table; see [[Sampling.waterfillAllocation]]. */
    def waterfillAllocation(keyCol: String, supplyCol: String,
                            budget: Long): DataFrame =
      Sampling.waterfillAllocation(df, keyCol, supplyCol, budget)

    /** Kaplan-Meier life table over this per-subject table; see
      * [[Behavior.kmTable]]. */
    def kmTable(durCol: String, observedCol: String): DataFrame =
      Behavior.kmTable(df, durCol, observedCol)

    /** Theil-Sen robust trend of this ordered series; see
      * [[SeriesStats.theilSen]]. */
    def theilSen(orderCol: String, valueCol: String): DataFrame =
      SeriesStats.theilSen(df, orderCol, valueCol)

    /** Per-key Theil-Sen robust trend (key-partitioned ranking, no
      * global window); see [[SeriesStats.theilSenByKey]]. */
    def theilSenByKey(keyCol: String, orderCol: String,
                      valueCol: String): DataFrame =
      SeriesStats.theilSenByKey(df, keyCol, orderCol, valueCol)

    /** Dominant period (strongest-ACF lag in [minLag, maxLag]); see
      * [[SeriesStats.dominantPeriod]]. */
    def dominantPeriod(orderCol: String, valueCol: String, minLag: Int,
                       maxLag: Int): DataFrame =
      SeriesStats.dominantPeriod(df, orderCol, valueCol, minLag, maxLag)

    /** CUSUM mean-shift changepoint of this ordered series; see
      * [[SeriesStats.changepoint]]. */
    def changepoint(orderCol: String, valueCol: String): DataFrame =
      SeriesStats.changepoint(df, orderCol, valueCol)

    /** Per-key CUSUM changepoint (key-partitioned windows); see
      * [[SeriesStats.changepointByKey]]. */
    def changepointByKey(keyCol: String, orderCol: String,
                         valueCol: String): DataFrame =
      SeriesStats.changepointByKey(df, keyCol, orderCol, valueCol)

    /** TextRank keyword centrality over this document table; see
      * [[Retrieval.textRank]]. */
    def textRank(textCol: String, rounds: Int, minLen: Int = 4,
                 topK: Int = 20): DataFrame =
      Retrieval.textRank(df, textCol, rounds, minLen, topK)

    /** Weighted Bellman-Ford distances over this (src, dst, w) edge
      * list; see [[Bfs.weightedDistances]]. */
    def weightedDistances(sources: DataFrame, rounds: Int): DataFrame =
      Bfs.weightedDistances(df, sources, rounds)

    /** Per-source-capped token admission over these docs; see
      * [[Sampling.tokenBudgetAllocated]]. */
    def tokenBudgetAllocated(alloc: DataFrame,
                             sourceCol: String = "source"): DataFrame =
      Sampling.tokenBudgetAllocated(df, alloc, sourceCol)
  }

  /** Pair-graph operations that need a session (driver-adaptive CC);
    * `pairs` carries (doc_id_a, doc_id_b). */
  implicit class GraftPairOps(private val pairs: DataFrame) extends AnyVal {

    /** Duplicate clusters from candidate pairs; see
      * [[ConnectedComponents.components]]. */
    def duplicateClusters(spark: SparkSession, srcCol: String = "doc_id_a",
                          dstCol: String = "doc_id_b"): DataFrame =
      ConnectedComponents.components(spark, pairs, srcCol, dstCol)
  }
}
