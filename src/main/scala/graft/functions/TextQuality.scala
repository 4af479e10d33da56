package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Ann, Dedup}

/** Text-analysis operators for a training-data pipeline, as a library:
  * quality features and filtering, language-ID, token counting,
  * winnowing fingerprints, corpus statistics (vocabulary / document
  * frequency / doc-term matrix), and the Gopher-style repetition rule.
  * The named gate queries in [[graft.SparkEntry]] are thin bindings
  * over these. Documents need (`doc_id`, `text`); everything is pure
  * codegen'd column expressions plus map-side-combinable aggregations.
  *
  * Float discipline: ratios and scores are left UNROUNDED — both
  * engines evaluate the same IEEE op sequence over exact integers, so
  * values match bitwise; rounding would reintroduce decimal-vs-binary
  * halfway splits. */
object TextQuality {

  val defaultStopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  /** Marker-token language model: language -> characteristic tokens.
    * A real pipeline swaps in learned n-gram frequencies; the scoring
    * and argmax shape below is the same. */
  val defaultLangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("window", "batch", "merge"),
    "en" -> Seq("the", "a", "of"),
    "es" -> Seq("data", "row", "value"),
    "fr" -> Seq("join", "sort", "filter"),
    "zh" -> Seq("spark", "query", "vector"))

  /** Stock (name, java-regex, replacement) triples for [[redact]]:
    * emails, IPv4, and NANP-style phone numbers. A production pipeline
    * extends this list; these three cover the audit shape. */
  val defaultPiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b", "<IP>"),
    ("phone", "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b", "<PHONE>"))

  /** T1: per-doc quality features — word counts, type-token ratio,
    * average word length, stopword ratio, and a blended quality score. */
  def textStats(docs: DataFrame,
                stopwords: Seq[String] = defaultStopwords): DataFrame = {
    val ws = TextAnalysis.words(col("text"))
    val nWords = size(ws).cast("long")
    val nDistinct = size(array_distinct(ws)).cast("long")
    val ttr = nDistinct.cast("double") / nWords
    val avgWlen = (length(col("text")) - (nWords - 1)).cast("double") / nWords
    val stopRatio = TextAnalysis.markerCount(ws, stopwords).cast("double") / nWords
    val quality = least(lit(1.0), nWords.cast("double") / 100.0) * 0.5 + ttr * 0.3 + stopRatio * 0.2
    docs.select(col("doc_id"),
      nWords.as("n_words"), nDistinct.as("n_distinct_words"),
      ttr.as("ttr"), avgWlen.as("avg_word_len"),
      stopRatio.as("stop_ratio"), quality.as("quality"))
  }

  /** Per-language marker-count score columns for `text`. */
  def langScores(markers: Seq[(String, Seq[String])] = defaultLangMarkers): Seq[(String, Column)] = {
    val ws = TextAnalysis.words(col("text"))
    markers.map { case (l, ms) => l -> TextAnalysis.markerCount(ws, ms) }
  }

  /** Deterministic argmax over the marker scores (first language in
    * marker order wins ties) — the language prediction column. */
  def langPredict(markers: Seq[(String, Seq[String])] = defaultLangMarkers): Column = {
    val scores = langScores(markers)
    scores.foldRight(lit(markers.last._1): Column) { case ((l, sc), acc) =>
      when(scores.filter(_._1 != l).map(_._2).foldLeft(lit(true): Column)((c, o) => c && sc >= o), lit(l))
        .otherwise(acc)
    }
  }

  /** T2: language-ID — per-language scores, prediction, label match. */
  def langId(docs: DataFrame,
             markers: Seq[(String, Seq[String])] = defaultLangMarkers): DataFrame = {
    val pred = langPredict(markers)
    docs.select(
      Seq(col("doc_id")) ++ langScores(markers).map { case (l, sc) => sc.as(s"s_$l") } ++
        Seq(pred.as("pred_lang"), (pred === col("lang")).as("matches_label")): _*)
  }

  /** T11: language confusion matrix — (label, prediction) doc counts,
    * the evaluation artifact a pipeline ships with its classifier. */
  def langConfusion(docs: DataFrame,
                    markers: Seq[(String, Seq[String])] = defaultLangMarkers): DataFrame =
    docs.select(col("lang"), langPredict(markers).as("pred_lang"))
      .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n_docs"))

  /** T3: token counting — whitespace, regex, and distinct tokenizers. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(TextAnalysis.words(col("text"))).cast("long").as("ws_tokens"),
      expr("size(regexp_extract_all(text, '[a-z0-9]+', 0))").cast("long").as("re_tokens"),
      expr("size(regexp_extract_all(text, '\\\\b[aeiou][a-z]*', 0))").cast("long").as("vowel_tokens"),
      size(array_distinct(TextAnalysis.words(col("text")))).cast("long").as("distinct_tokens"))

  /** T4: winnowing fingerprints — min hash per sliding window of
    * `win` consecutive char-`gram`-gram hashes, per-doc count + min.
    * Char grams via exploded positions + substr (codegen'd), not a
    * transform lambda (interpreted). */
  def winnowingFingerprints(docs: DataFrame, gram: Int = 5, win: Int = 4): DataFrame = {
    val g = docs
      .filter(length(col("text")) >= gram)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), length(col("text")) - (gram - 1))).as("i"))
      .select(col("doc_id"), col("i"),
        md5(col("text").substr(col("i"), lit(gram))).as("h"))
    val w = Window.partitionBy("doc_id").orderBy("i").rowsBetween(-(win - 1), 0)
    g.withColumn("fp", min(col("h")).over(w))
      .filter(col("i") >= win)
      .select("doc_id", "fp").distinct()
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_fingerprints"), min(col("fp")).as("min_fp"))
  }

  /** T7: corpus vocabulary — top-`topN` terms by total frequency (the
    * seed stats a tokenizer/BPE trainer consumes). Word keys are high-
    * cardinality, so the groupBy partial-aggregates map-side and the
    * top-N is a TakeOrdered, not a global sort. */
  def vocabulary(docs: DataFrame, topN: Int = 50): DataFrame =
    docs.select(explode(TextAnalysis.words(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("word"))
      .limit(topN)

  /** T10: repetition ratio (Gopher/FineWeb-style quality rule) —
    * fraction of duplicate word-3-shingles per doc; high values flag
    * boilerplate and degenerate generations. */
  def repetitionRatio(docs: DataFrame): DataFrame =
    Dedup.wordShingles(docs)
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_shingles"),
        countDistinct(col("sh")).as("n_distinct"))
      .select(col("doc_id"), col("n_shingles"), col("n_distinct"),
        (lit(1.0) - col("n_distinct").cast("double") / col("n_shingles"))
          .as("dup_ratio"))

  /** T9: doc-term matrix head — top-`k` terms per document by term
    * frequency (the per-document half of TF-IDF as exact integers).
    * Two-phase top-k: at corpus scale the per-doc ranking must not
    * funnel into one partition per doc_id. */
  def docTerms(docs: DataFrame, k: Int = 3): DataFrame =
    Ann.topKPerGroup(
      docs.select(col("doc_id"), explode(TextAnalysis.words(col("text"))).as("word"))
        .groupBy("doc_id", "word").agg(count(lit(1)).as("tf")),
      Seq("doc_id"), Seq(col("tf").desc, col("word")), k, "rnk")
      .select("doc_id", "rnk", "word", "tf")

  /** T8: document frequency (the exact-integer side of IDF) — number
    * of docs containing each term, for terms in >= `minDf` docs.
    * array_distinct before the explode so a doc counts once per term. */
  def docFreq(docs: DataFrame, minDf: Long = 25L): DataFrame =
    docs.select(col("doc_id"),
      explode(array_distinct(TextAnalysis.words(col("text")))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)

  /** T16: full TF-IDF top-`k` terms per document, with a RATIONAL idf:
    * score_ppm = tf * 1e6 div df (integer division). The usual
    * log-idf is a monotone transform of 1/df per fixed tf, but tf·log
    * and tf/df do rank differently — this variant is chosen because it
    * is engine-exact (pure bigints; transcendental functions never
    * cross the oracle boundary, per the repo's float-parity rules) and
    * preserves the property that rare terms dominate. Rank ties break
    * on raw tf then term text, so the output is fully deterministic.
    *
    * Scale shape: one shuffle on (doc_id, word) for tf, one partial-
    * aggregated shuffle on word for df, a word-keyed join (both sides
    * word-partitioned), and the hotspot-free two-phase top-k. */
  def tfIdfTopTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    val words = docs.select(col("doc_id"),
      explode(TextAnalysis.words(col("text"))).as("word"))
    val tf = words.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val df = words.distinct().groupBy("word").agg(count(lit(1)).as("df"))
    val scored = tf.join(df, "word")
      .select(col("doc_id"), col("word"), col("tf"), col("df"),
        expr("tf * 1000000 DIV df").as("score_ppm"))
    Ann.topKPerGroup(scored, Seq("doc_id"),
      Seq(col("score_ppm").desc, col("tf").desc, col("word")), k, "rnk")
      .select("doc_id", "rnk", "word", "tf", "df", "score_ppm")
  }

  /** T17: word-bigram FAMILIARITY — a language-model-style quality
    * signal without a language model: how common are this document's
    * word bigrams in the corpus? familiarity_ppm is the mean corpus
    * count of the doc's bigram occurrences, scaled by the corpus total
    * (ppm of probability mass, integer division — engine-exact).
    * Low scores flag out-of-distribution/garbled text, very high
    * scores flag boilerplate — the two tails a curation pipeline
    * trims. The real-LM version swaps the count table for learned
    * n-gram log-probs; the dataflow (model-as-table join + per-doc
    * aggregate) is identical.
    *
    * Scale shape: bigram counts are one partial-aggregated groupBy on
    * the bigram key; the per-occurrence join against them rides the
    * same key; the corpus total is a one-row broadcast. Doc scores are
    * exact bigints until the final ppm division. */
  def bigramFamiliarity(docs: DataFrame): DataFrame = {
    val bi = Dedup.wordShingles(docs, 2)
    val counts = bi.groupBy("sh").agg(count(lit(1)).as("c"))
    val total = counts.agg(sum(col("c")).as("total"))
    bi.join(counts, "sh")
      .groupBy("doc_id")
      .agg(sum(col("c")).as("sum_c"), count(lit(1)).as("n_bigrams"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("n_bigrams"),
        expr("sum_c * 1000000 DIV (n_bigrams * total)").as("familiarity_ppm"))
  }

  /** T12: sequence PACKING — the GPT-style pretraining layout: within
    * each shard, document token streams are concatenated in doc_id
    * order and cut every `capacity` tokens; a document can span
    * sequences. Emits one row per (doc, sequence) span with the token
    * count that lands in that sequence — the assignment table a
    * packing writer consumes.
    *
    * Pure integer arithmetic over ONE window pass: exclusive running
    * token sum per shard, then span explosion — no sequential
    * recurrence needed (unlike next-fit packing, stream-cut packing is
    * exactly a cumulative sum). Sharding bounds the window partitions:
    * the global-concatenation variant would funnel the corpus through
    * one partition, so at scale you pack per shard (as real pipelines
    * do) and the shard key rides the same exchange. */
  def packSequences(docs: DataFrame, capacity: Long,
                    shardCol: String = "lang"): DataFrame = {
    val toks = docs.select(col(shardCol).as("shard"), col("doc_id"),
      size(TextAnalysis.words(col("text"))).cast("long").as("n_tok"))
    val cum = toks.withColumn("tok0", coalesce(sum(col("n_tok")).over(
      Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    // longs: `div` (integer division); operands are non-negative so
    // div == floor on both engines.
    cum
      .select(col("shard"), col("doc_id"), col("n_tok"), col("tok0"),
        explode(sequence(expr(s"tok0 div ${capacity}L"),
          expr(s"(tok0 + n_tok - 1) div ${capacity}L"))).as("seq_id"))
      .select(col("shard"), col("doc_id"), col("seq_id"),
        (least((col("seq_id") + 1) * capacity, col("tok0") + col("n_tok"))
          - greatest(col("seq_id") * capacity, col("tok0"))).as("seq_tokens"))
  }

  /** T14: BPE pair counting — the first iteration of byte-pair-encoding
    * tokenizer training: adjacent character-pair frequencies over the
    * vocabulary, weighted by word frequency (count over distinct WORDS
    * scaled by tf, not over raw corpus positions — the standard BPE
    * trainer shape). Pure relational: vocab groupBy, position explode,
    * substr pairs, weighted sum; top-`topN` ranked (count desc, pair
    * asc) is a TakeOrdered. Iterating the merge loop re-runs this over
    * the re-segmented vocab; each round is this same aggregation. */
  def bpePairCounts(docs: DataFrame, topN: Int = 30): DataFrame = {
    val vocab = docs
      .select(explode(TextAnalysis.words(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("tf"))
    vocab
      .filter(length(col("word")) >= 2)
      .select(col("word"), col("tf"),
        explode(sequence(lit(1), length(col("word")) - 1)).as("i"))
      .select(col("word").substr(col("i"), lit(1)).as("lhs"),
        col("word").substr(col("i") + 1, lit(1)).as("rhs"), col("tf"))
      .groupBy("lhs", "rhs").agg(sum(col("tf")).as("pair_count"))
      .orderBy(col("pair_count").desc, col("lhs"), col("rhs"))
      .limit(topN)
  }

  /** T15: the BPE MERGE LOOP — actual tokenizer training, `rounds`
    * iterations of count -> argmax -> re-segment over the vocabulary:
    * each round counts adjacent symbol pairs (tf-weighted), picks the
    * most frequent (ties broken lexicographically), and merges every
    * occurrence in the space-separated segmentation. Returns the merge
    * table (round, lhs, rhs, pair_count) — the artifact a BPE
    * tokenizer ships.
    *
    * The one driver-side step is the per-round argmax (a 1-row
    * collect — codebook training, like the k-means seeds): symbol
    * statistics stay distributed, and the vocab is persisted per round
    * so each iteration is one aggregation over |vocab| rows, not a
    * corpus re-scan.
    *
    * The merge step is exactly the standard greedy left-to-right
    * non-overlapping merge. A plain space-padded replace of " l r "
    * is NOT: the match consumes the shared separator, so adjacent
    * occurrences are skipped ("a a a a" -> "aa a a"). Doubling the
    * inter-symbol gaps first fixes that — the pattern " l  r " takes
    * one space from each side of a two-space gap, leaving the
    * neighboring occurrence its leading space, and a single replace
    * pass lands on precisely the greedy merge set (property-tested
    * against a reference implementation in BpeMergeSpec; symbols never
    * contain spaces, so matches always align to symbol boundaries). */
  def bpeMerges(docs: DataFrame, rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (vocab, merges) = bpeTrain(docs, rounds)
    vocab.unpersist()
    merges.toDF("round", "lhs", "rhs", "pair_count")
  }

  /** T18: tokenize the corpus with the tokenizer [[bpeMerges]] trains —
    * the apply half of the BPE loop. Segmentation happens once per
    * VOCAB word (the training loop already maintains exactly that
    * table), so applying the tokenizer to the corpus is a vocab-sized
    * join (broadcastable — the canonical model-as-table shape), never
    * a per-occurrence re-merge. Output: per-doc whitespace word count
    * and BPE token count — the budget numbers a packing/pricing stage
    * consumes. */
  def bpeTokenize(docs: DataFrame, rounds: Int): DataFrame = {
    val (vocab, _) = bpeTrain(docs, rounds)
    val wordTok = vocab.select(col("word"),
      size(split(col("seg"), " ")).cast("long").as("n_tok"))
    val out = docs
      .select(col("doc_id"), explode(TextAnalysis.words(col("text"))).as("word"))
      .join(wordTok, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("n_tok")).as("n_bpe_tokens"))
    // Safe to release here: the returned plan re-derives the vocab on
    // evaluation as the base aggregation + `rounds` narrow literal
    // replaces (the merge argmaxes were collected eagerly above), so
    // no consumer ever re-runs the training collects.
    vocab.unpersist()
    out
  }

  /** Shared BPE training loop: returns the persisted segmented vocab
    * after `rounds` greedy merges (word, tf, seg) and the merge list
    * (round, lhs, rhs, pair_count). Callers own the final unpersist. */
  private def bpeTrain(docs: DataFrame,
                       rounds: Int): (DataFrame, Seq[(Long, String, String, Long)]) = {
    var vocab = docs
      .select(explode(TextAnalysis.words(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("tf"))
      // split on INTERIOR between-chars boundaries only: both "" and
      // "(?!^)" also match at end-of-word, and Spark's limit -1 keeps
      // the trailing empty symbol — which then shows up as phantom
      // (last-char, "") pairs in the counts. (?s) so tokens containing
      // newlines still split per char.
      .withColumn("seg", concat_ws(" ", split(col("word"), "(?s)(?<=.)(?=.)")))
      .persist()
    vocab.count()
    val merges = scala.collection.mutable.ListBuffer[(Long, String, String, Long)]()
    for (r <- 1 to rounds) {
      val wWin = Window.partitionBy("word").orderBy("pos")
      val top = vocab
        .select(col("word"), col("tf"), posexplode(split(col("seg"), " ")))
        .withColumnRenamed("col", "sym")
        .withColumn("nxt", lead("sym", 1).over(wWin))
        .filter(col("nxt").isNotNull)
        .groupBy(col("sym").as("lhs"), col("nxt").as("rhs"))
        .agg(sum(col("tf")).as("cnt"))
        .orderBy(col("cnt").desc, col("lhs"), col("rhs"))
        .limit(1).collect()(0)
      val (l, rr, c) = (top.getString(0), top.getString(1), top.getLong(2))
      merges += ((r.toLong, l, rr, c))
      // Pattern and replacement are Column LITERALS, never interpolated
      // SQL text: symbols come from the corpus and may contain quotes
      // ("don't") or anything else tokenization lets through — a
      // string-built expr() would hand them to the SQL parser.
      val doubled = concat(lit("  "),
        replace(col("seg"), lit(" "), lit("  ")), lit("  "))
      val merged = replace(doubled, lit(s" $l  $rr "), lit(s" $l$rr "))
      val next = vocab
        .withColumn("seg", trim(replace(merged, lit("  "), lit(" "))))
        .persist()
      next.count()
      vocab.unpersist()
      vocab = next
    }
    (vocab, merges.toSeq)
  }

  /** T13: pattern REDACTION — the PII-scrub stage (emails, IPs, ids)
    * every distributed training corpus passes through before packing.
    * Each pattern is (name, regex, replacement): the output carries a
    * per-pattern match count (audit trail) and the text with all
    * patterns replaced, applied in order. Pure codegen'd regex
    * projection, no shuffle. Keep the regexes in the portable subset
    * (character classes, +, \\.) — the engine is Java regex; exotic
    * constructs may not match other engines' dialects. */
  def redact(docs: DataFrame,
             patterns: Seq[(String, String, String)]): DataFrame = {
    val countCols = patterns.map { case (n, re, _) =>
      regexp_count(col("text"), lit(re)).cast("long").as(s"n_$n")
    }
    val redacted = patterns.foldLeft(col("text")) {
      case (c, (_, re, rep)) => regexp_replace(c, re, rep)
    }
    docs.select(col("doc_id") +: countCols :+ redacted.as("redacted"): _*)
  }

  /** T19: feature-hashed LINEAR CLASSIFIER scoring — the fastText-style
    * quality-model head (score = Σ tf(token)·w(bucket(token))) that
    * pipelines like CCNet run as the "looks like Wikipedia?" filter.
    * The hashing-trick bucket is the first 4 hex digits of
    * md5("qc|" + token) and the stand-in weight is (bucket − 32768) —
    * a production run swaps in a learned weight table keyed by the
    * SAME bucket (a broadcast map lookup; the dataflow is identical).
    * Everything is exact integer arithmetic: (doc_id, n_tokens, sum_w,
    * keep = sum_w > 0). One token explode + one partial-agg groupBy —
    * linear, no shuffle beyond the doc_id aggregation. */
  def hashedLinearScore(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"),
      explode(TextAnalysis.words(col("text"))).as("w"))
    val bucket = conv(substring(md5(concat(lit("qc|"), col("w"))), 1, 4), 16, 10)
      .cast("long")
    tok.select(col("doc_id"), (bucket - 32768L).as("wgt"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("wgt")).as("sum_w"))
      .withColumn("keep", col("sum_w") > 0L)
  }

  /** T20: sliding-window CHUNKING for embedding/RAG indexing — cut each
    * document into `window`-token chunks every `stride` tokens (the
    * overlap `window - stride` preserves cross-boundary context), one
    * output row per chunk with its token count and content digest.
    * A doc shorter than `window` yields exactly one chunk. Pure
    * projection + explode: zero shuffles, fully codegen'd — the shape
    * that feeds a 100 TB corpus into an embedding model. */
  def slidingChunks(docs: DataFrame, window: Int = 32,
                    stride: Int = 24): DataFrame = {
    val ws = TextAnalysis.words(col("text"))
    // codegen WordWindows: chunk join + token count emitted together
    // (the transform(sequence, slice) spelling paid an interpreted
    // lambda + materialized slice per chunk, then re-joined downstream)
    val chunks = {
      import org.apache.spark.sql.graftbridge.Bridge
      Bridge.column(WordWindows(Bridge.expression(ws), window, stride))
    }
    docs
      .select(col("doc_id"), posexplode(chunks).as(Seq("chunk_idx", "cw")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("cw.n_tokens").as("n_tokens"),
        md5(col("cw.chunk")).as("chunk_md5"))
  }

  /** T6: the quality FILTER gate — the training-pipeline stage that
    * consumes t1's features: keep docs long enough and lexically
    * diverse enough. */
  def qualityFilter(docs: DataFrame, minWords: Long = 40L,
                    minTtr: Double = 0.5): DataFrame = {
    val ws = TextAnalysis.words(col("text"))
    val nWords = size(ws).cast("long")
    val ttr = size(array_distinct(ws)).cast("double") / nWords
    docs
      .select(col("doc_id"), col("lang"), nWords.as("n_words"), ttr.as("ttr"))
      .filter(col("n_words") >= minWords && col("ttr") >= minTtr)
  }

  /** T21: INTRA-document repetition scrub — the Gopher/C4 within-doc
    * rule that [[graft.operators.Dedup.chunkDedup]]'s CROSS-doc
    * election deliberately does not apply: cut the doc into
    * `chunkWords`-word chunks, keep only the FIRST occurrence of each
    * repeated chunk, reassemble in order. Returns
    * (doc_id, text, n_chunks, n_dropped).
    *
    * Entirely per-row array algebra — chunk, then `array_distinct`
    * (which is exactly keep-first-occurrence-in-order, evaluated as a
    * linear hash-set pass), then reassemble — ZERO shuffle, no
    * explode, no state, so it runs at scan speed on a 100 TB corpus
    * and is streamable at ingest like [[slidingChunks]]. The chunk
    * width is the policy knob: production paragraph-sized, the gate
    * uses the corpus-calibrated width that actually exercises drops. */
  def scrubRepeats(docs: DataFrame, chunkWords: Int = 2): DataFrame = {
    val ws = TextAnalysis.words(col("text"))
    // codegen chunker, shared with Dedup.chunkDedup
    val chunks = {
      import org.apache.spark.sql.graftbridge.Bridge
      Bridge.column(WordChunks(Bridge.expression(ws), chunkWords))
    }
    docs
      .withColumn("__chunks", chunks)
      .withColumn("__kept", array_distinct(col("__chunks")))
      .select(col("doc_id"),
        concat_ws(" ", col("__kept")).as("text"),
        size(col("__chunks")).cast("long").as("n_chunks"),
        (size(col("__chunks")) - size(col("__kept"))).cast("long").as("n_dropped"))
  }

  /** T22: REGEX PRETOKENIZATION counts — the GPT-2-style pretokenizer
    * pass (split into letter runs / digit runs / punctuation runs
    * before BPE ever sees the text; reference pattern family:
    * `'s|'t|\p{L}+|\p{N}+|...` — here the lowercase-ASCII corpus
    * subset). Emits per-doc token counts by class, the stats a
    * tokenizer-budget planner consumes (chars-per-token, digit/punct
    * load). Pure per-row projection over `regexp_extract_all`: zero
    * shuffle, streamable; the class counts are exact integers. */
  def regexPretokenize(docs: DataFrame,
      pattern: String = "[a-z]+|[0-9]+|[^a-z0-9 ]+"): DataFrame = {
    val toks = regexp_extract_all(col("text"), lit(pattern), lit(0))
    docs
      .withColumn("__toks", toks)
      .select(col("doc_id"),
        size(col("__toks")).cast("long").as("n_tokens"),
        size(filter(col("__toks"), t => t.rlike("^[a-z]+$"))).cast("long").as("n_alpha"),
        size(filter(col("__toks"), t => t.rlike("^[0-9]+$"))).cast("long").as("n_digit"),
        size(filter(col("__toks"),
          t => !t.rlike("^[a-z]+$") && !t.rlike("^[0-9]+$"))).cast("long").as("n_punct"))
  }

  /** The t6 keep-predicate as a bare Column, for pipelines that filter
    * inline and keep `text` flowing (a filter on the scan beats a
    * stats-projection + join-back at any scale). */
  def qualityPredicate(minWords: Long = 40L, minTtr: Double = 0.5): Column = {
    val ws = TextAnalysis.words(col("text"))
    val nWords = size(ws).cast("long")
    val ttr = size(array_distinct(ws)).cast("double") / nWords
    nWords >= minWords && ttr >= minTtr
  }

  /** T26: character-distribution Shannon entropy per doc (the
    * [[CharEntropy]] native expression): one per-row scalar pass —
    * never the explode-per-character relational form, whose ~10^3×
    * row blowup would dominate the quality-scoring scan. Output
    * entropy rounds to 6 (sub-ulp log/summation-order drift between
    * engines). */
  def charEntropy(docs: DataFrame): DataFrame = {
    val ce = {
      import org.apache.spark.sql.graftbridge.Bridge
      Bridge.column(CharEntropy(Bridge.expression(col("text"))))
    }
    docs.select(col("doc_id"), ce.as("ce"))
      .select(col("doc_id"), col("ce.n_chars").as("n_chars"),
        col("ce.n_distinct_chars").as("n_distinct_chars"),
        round(col("ce.entropy_bits"), 6).as("entropy_bits"))
  }

  /** T28: per-doc script-mix profile (the [[ScriptMix]] native
    * expression): coarse Unicode-range class counts + the
    * fixed-precedence dominant script — one per-row scalar pass, the
    * same zero-blowup discipline as [[charEntropy]]. */
  def scriptMix(docs: DataFrame, textCol: Column): DataFrame = {
    val sm = {
      import org.apache.spark.sql.graftbridge.Bridge
      Bridge.column(ScriptMix(Bridge.expression(textCol)))
    }
    docs.select(col("doc_id"), sm.as("sm"))
      .select(col("doc_id"), col("sm.n_latin").as("n_latin"),
        col("sm.n_digit").as("n_digit"),
        col("sm.n_cyrillic").as("n_cyrillic"),
        col("sm.n_cjk").as("n_cjk"), col("sm.n_other").as("n_other"),
        col("sm.dominant").as("dominant"))
  }

  /** T35: FUSED single-scan text-quality PROFILE — t1's stats, t2's
    * language-ID, t19's hashed-classifier score, t26's character
    * entropy and t28's script mix emitted together from ONE projection
    * over ONE scan of the corpus. The per-gate operators each scan
    * `documents` independently; a 100 TB corpus pays five passes for
    * what one computes (x15's fused-profile discipline applied to
    * text). Column-for-column equal to the five per-gate outputs
    * (TextProfileSpec pins it): every member is either already a
    * per-row scalar (t1/t2/t26/t28) or re-expressed in-row here —
    * t19's token explode + groupBy becomes an array fold over the same
    * word list with the same md5-bucket weights (integer sum, order-
    * free, so the fold equals the shuffle bitwise) — which also
    * removes t19's one exchange: the whole profile is exchange-free,
    * a pure scan-speed projection.
    *
    * `scriptCol` lets the caller salt the script-mix input (t28's
    * fixture discipline) without a second text column in the scan. */
  def textProfile(docs: DataFrame,
                  stopwords: Seq[String] = defaultStopwords,
                  markers: Seq[(String, Seq[String])] = defaultLangMarkers,
                  scriptCol: Column = col("text")): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    val ws = TextAnalysis.words(col("text"))
    // t1
    val nWords = size(ws).cast("long")
    val nDistinct = size(array_distinct(ws)).cast("long")
    val ttr = nDistinct.cast("double") / nWords
    val avgWlen = (length(col("text")) - (nWords - 1)).cast("double") / nWords
    val stopRatio = TextAnalysis.markerCount(ws, stopwords).cast("double") / nWords
    val quality = least(lit(1.0), nWords.cast("double") / 100.0) * 0.5 +
      ttr * 0.3 + stopRatio * 0.2
    // t2
    val scores = langScores(markers)
    val pred = langPredict(markers)
    // t19, in-row: same tokenization, same md5 bucket, same stand-in
    // weight; a sum of int64s is order-free, so the fold == the groupBy
    val wgts = transform(ws, w =>
      conv(substring(md5(concat(lit("qc|"), w)), 1, 4), 16, 10)
        .cast("long") - 32768L)
    val sumW = aggregate(wgts, lit(0L), (a, x) => a + x)
    // t26 / t28 native single-pass expressions
    val ce = Bridge.column(CharEntropy(Bridge.expression(col("text"))))
    val sm = Bridge.column(ScriptMix(Bridge.expression(scriptCol)))
    // two-step projection (struct columns first) — Catalyst's collapse
    // keeps it ONE scan-side projection; TextProfileSpec pins the
    // single-scan plan
    docs.withColumn("__ce", ce).withColumn("__sm", sm).select(Seq(
      col("doc_id"),
      nWords.as("n_words"), nDistinct.as("n_distinct_words"),
      ttr.as("ttr"), avgWlen.as("avg_word_len"),
      stopRatio.as("stop_ratio"), quality.as("quality")) ++
      scores.map { case (l, sc) => sc.as(s"s_$l") } ++ Seq(
      pred.as("pred_lang"), (pred === col("lang")).as("matches_label"),
      nWords.as("n_tokens"), sumW.as("sum_w"), (sumW > 0L).as("keep"),
      col("__ce.n_chars").as("n_chars"),
      col("__ce.n_distinct_chars").as("n_distinct_chars"),
      round(col("__ce.entropy_bits"), 6).as("entropy_bits"),
      col("__sm.n_latin").as("n_latin"), col("__sm.n_digit").as("n_digit"),
      col("__sm.n_cyrillic").as("n_cyrillic"), col("__sm.n_cjk").as("n_cjk"),
      col("__sm.n_other").as("n_other"),
      col("__sm.dominant").as("dominant")): _*)
  }

  /** Text NORMALIZATION scrub (the C4/CCNet ingest pre-pass that runs
    * before any tokenize/shingle stage): ASCII control characters
    * become spaces, space runs collapse to one, edges trim. Pure
    * per-row projection — zero shuffle, streamable, codegen'd
    * regexp_replace — and the regexes are RE2-compatible so the same
    * normalization replays in any engine. A corpus where "a\t b" and
    * "a b" shingle differently silently halves every dedup operator's
    * recall; this is the choke point that prevents it. */
  def cleanText(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(c, "[\\x00-\\x1f]", " "), " {2,}", " "))

  /** URL canonicalization — the web-corpus dedup pre-pass: two fetches
    * of the same resource must hash equal before any URL-keyed dedup
    * or frontier dedup works. Rules (the conservative, always-safe
    * subset): strip the fragment; lowercase scheme and host:port;
    * drop the scheme's default port (:80 http, :443 https); sort
    * query parameters (order is almost never significant; sorting is
    * what makes ?a=1&b=2 and ?b=2&a=1 collide); strip one trailing
    * slash from a non-root path. Path case and param values are
    * PRESERVED (case-sensitive on most servers). Pure per-row
    * projection of builtin string functions — zero shuffle, and every
    * rule replays as the same SQL in any engine. */
  def canonicalUrl(u: Column): Column = {
    val noFrag = substring_index(u, "#", 1)
    // hier = everything after "://" (inputs are absolute URLs)
    val scheme = lower(substring_index(noFrag, "://", 1))
    val hier = substring_index(noFrag, "://", -1)
    val hasQ = instr(hier, "?") > 0
    val prePath = when(hasQ, substring_index(hier, "?", 1)).otherwise(hier)
    val query = when(hasQ, substring_index(hier, "?", -1)).otherwise(lit(""))
    val hostPort = lower(substring_index(prePath, "/", 1))
    val path = prePath.substr(length(hostPort) + 1, length(prePath))
    val hostClean = when(scheme === "http",
        regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val pathClean = when(length(path) > 1,
      regexp_replace(path, "/$", "")).otherwise(path)
    val sortedQ = array_join(array_sort(split(query, "&")), "&")
    concat(scheme, lit("://"), hostClean, pathClean,
      when(hasQ, concat(lit("?"), sortedQ)).otherwise(lit("")))
  }

  /** Host (authority, without any port) of an absolute URL — the
    * grouping key for domain-level curation (per-host quality stats,
    * domain blocklists). Feed it [[canonicalUrl]] output so case and
    * default-port variants of one host collapse first. Zero-shuffle
    * projection; replays as nested split_part in any engine. */
  def hostOf(u: Column): Column =
    substring_index(
      substring_index(substring_index(u, "://", -1), "/", 1), ":", 1)

  /** Heaps-law vocabulary-growth curve (Heaps 1978): how fast does the
    * corpus vocabulary V(N) grow as tokens N accumulate — the empirical
    * input to tokenizer-vocab sizing and "is more of this source still
    * adding words" curation calls. The corpus is cut into `buckets`
    * equal doc_id ranges by ARITHMETIC on the id bounds (no global
    * sort/ntile — a rank-based cut would funnel the whole corpus
    * through one ordered partition); each token's first-appearance
    * bucket comes from one groupBy(token) min, so the whole curve
    * costs one token exchange plus a `buckets`-row cumulative window.
    * ttr_ppm = cum_types*1e6 div cum_tokens is the exact-integer
    * type-token ratio per checkpoint — monotonically falling for any
    * natural corpus; a flat curve means the source is still novel,
    * a cliff means it repeats itself (cf. t34's Gopher repetition
    * rule at document granularity). */
  def vocabGrowth(docs: DataFrame, buckets: Int): DataFrame = {
    val bounds = docs.agg(min(col("doc_id")).as("__mn"),
      max(col("doc_id")).as("__mx"))
    val tok = docs.crossJoin(broadcast(bounds))
      .select(
        expr(s"(doc_id - __mn) * $buckets div (__mx - __mn + 1)")
          .as("bucket"),
        explode(split(col("text"), " ")).as("tok"))
    val perBucket = tok.groupBy("bucket").agg(count(lit(1)).as("tokens"))
    val firstSeen = tok.groupBy("tok").agg(min(col("bucket")).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("new_types"))
    // `buckets` rows total: the single-partition ordered window is
    // bounded by construction, not by data size.
    val w = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBucket.join(firstSeen, Seq("bucket"), "left_outer")
      .na.fill(0L, Seq("new_types"))
      .withColumn("cum_tokens", sum(col("tokens")).over(w))
      .withColumn("cum_types", sum(col("new_types")).over(w))
      .withColumn("ttr_ppm", expr("cum_types * 1000000 div cum_tokens"))
  }
}
