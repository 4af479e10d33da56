package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Sparse lexical retrieval (BM25, Robertson et al., TREC-3) and
  * hybrid rank fusion — the keyword half of the retrieval surface the
  * ANN family ([[Ann]]) covers on the dense side. An LLM-data
  * pipeline uses this shape for retrieval-based decontamination
  * ("which training docs does this benchmark query retrieve?"),
  * targeted data selection, and hard-negative mining.
  *
  * BM25 here is the engine-parity RATIONAL-IDF form: every score is
  * exact int64 arithmetic, so Spark and any replaying engine agree
  * bit-for-bit (t16's discipline — transcendental `ln` never crosses
  * the oracle boundary). With k1 = 6/5 and b = 3/4 (the standard
  * 1.2/0.75), per matched query term:
  *
  * {{{
  *   idf      = (2N - 2df + 1) / (2df + 1)          // (N-df+.5)/(df+.5)
  *   tf_sat   = 22*tf*total / (10*total*tf + 3*total + 9*dl*N)
  *              // = tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl)),
  *              // both sides scaled by 10*total, avgdl = total/N
  *   term_milli = idf_num * sat_num * 1000  DIV  idf_den * sat_den
  * }}}
  *
  * and a doc's score is the SUM of its matched terms' integer
  * milli-scores — commutative, so aggregation order cannot perturb
  * ranking (a float-sum score would tie-break differently across
  * partitionings). The log-idf production variant swaps one
  * projection; the dataflow is identical.
  *
  * int64 envelope: the largest intermediate is
  * `(2N+1) * 22000 * tf_max * total`, so the scaled form requires
  * `N * tf_max * total < ~4e14` (sf0.1: 5e3 * 14 * 2.7e5 ≈ 1.9e13,
  * 200x headroom). Beyond that, shrink the SCALE constant or move the
  * final division earlier — the ranking only needs milli precision.
  *
  * 100 TB shape: tf is ONE corpus exchange on (doc_id, word) with
  * map-side combine; df and dl (the norms table) derive from tf, not
  * from a second corpus pass. The query side is tiny and BROADCAST
  * into the postings, so the corpus never shuffles on the query join;
  * only the matched postings (|query terms| * their posting lists)
  * shuffle again — once on doc_id to meet the norms table, once on
  * (query_id, doc_id) to sum. Persist tf bucketed by word and dl
  * bucketed by doc_id and repeated query batches probe a static
  * inverted index with zero corpus-side work.
  */
object Retrieval {

  /** Top-k docs per query under rational-idf BM25 (k1=1.2, b=0.75).
    *
    * `docs`: (doc_id, text); `queryTerms`: (query_id, word), small
    * enough to broadcast (a query workload, not a corpus). Emits
    * (query_id, rnk, doc_id, n_terms, score_milli) for docs matching
    * >= 1 query term; rnk orders by (score_milli DESC, doc_id).
    */
  def bm25TopK(docs: DataFrame, queryTerms: DataFrame, k: Int = 10): DataFrame = {
    val words = docs.select(col("doc_id"),
      explode(TextAnalysis.words(col("text"))).as("word"))
    val tf = words.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val df = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val consts = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("total"))

    val q = queryTerms.select("query_id", "word").distinct()
    // df pruned to query words first: the broadcast side stays
    // |query terms|-sized even though df itself is vocabulary-sized.
    val qRef = q.join(df, "word")
    val hits = tf.join(broadcast(qRef), "word")
      .join(dl, "doc_id")
      .crossJoin(broadcast(consts))
      .select(col("query_id"), col("doc_id"),
        expr("""(2 * n_docs - 2 * df + 1) * (22 * tf * total) * 1000
                DIV ((2 * df + 1)
                     * (10 * total * tf + 3 * total + 9 * dl * n_docs))""")
          .as("term_milli"))
    val scored = hits.groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("term_milli").as("score_milli"))
    Ann.topKPerGroup(scored, Seq("query_id"),
      Seq(col("score_milli").desc, col("doc_id")), k, "rnk")
      .select("query_id", "rnk", "doc_id", "n_terms", "score_milli")
  }

  /** Reciprocal-rank fusion (Cormack et al., SIGIR'09) of two ranked
    * lists — the standard hybrid-retrieval combiner (lexical BM25 +
    * dense ANN): a doc's fused score is the sum over lists of
    * 1/(c + rank), c = 60. Kept exact as NANO-scaled integers
    * (`1e9 DIV (c + rnk)`), so fusion is commutative integer
    * addition — engine-identical, never a float sum whose order could
    * flip a tie.
    *
    * Inputs are (query_id, doc_id, rnk) ranked lists (rnk from 1).
    * Emits (query_id, rnk, doc_id, n_lists, fused_nano) top-k per
    * query, ordered by (fused_nano DESC, doc_id). Scale: both inputs
    * are top-k-per-query lists — |queries| * k rows, metadata-sized;
    * one union + one aggregation, no corpus contact.
    */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int = 10, c: Long = 60L): DataFrame = {
    val cols = Seq("query_id", "doc_id", "rnk")
    val u = a.select(cols.map(col): _*).union(b.select(cols.map(col): _*))
    val scored = u
      .select(col("query_id"), col("doc_id"),
        expr(s"1000000000 DIV (${c}L + rnk)").as("contrib_nano"))
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_lists"), sum("contrib_nano").as("fused_nano"))
    Ann.topKPerGroup(scored, Seq("query_id"),
      Seq(col("fused_nano").desc, col("doc_id")), k, "rnk")
      .select("query_id", "rnk", "doc_id", "n_lists", "fused_nano")
  }

  /** TextRank keyword extraction (Mihalcea & Tarau 2004): corpus
    * keywords by [[PageRank]] centrality on the word ADJACENCY graph
    * — the unsupervised keyword scorer TF-IDF can't be (frequency
    * rewards common words; centrality rewards words that CONNECT
    * vocabulary). Whitespace bigrams (the t17/t24 tokenization) give
    * the edges: distinct unordered content-word pairs (length >=
    * `minLen` filters function words, the classical syntactic-filter
    * stand-in), mirrored for the undirected walk. Ranks reuse
    * [[PageRank.ranks]]' exact integer micro-rank recurrence, so the
    * whole composition replays in any engine; top-k is deterministic
    * (rank desc, word asc over unique words).
    *
    * Scale shape: one corpus pass explodes in-row adjacent pairs
    * (never a token self-join), everything after runs on the
    * VOCABULARY-PAIR domain (edges), then vocabulary domain (ranks) —
    * the graph is corpus-size-independent once the pair set
    * saturates. */
  def textRank(docs: DataFrame, textCol: String, rounds: Int,
               minLen: Int = 4, topK: Int = 20): DataFrame = {
    require(rounds >= 1 && topK >= 1 && minLen >= 1)
    val pairs = docs
      .select(split(col(textCol), " ").as("__ws"))
      .select(explode(expr(
        """transform(slice(__ws, 1, size(__ws) - 1),
             (w, i) -> struct(w AS a, __ws[i + 1] AS b))""")).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .filter(length(col("a")) >= minLen && length(col("b")) >= minLen
        && col("a") =!= col("b"))
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .union(pairs.select(col("b").as("src"), col("a").as("dst")))
      .distinct()
    PageRank.ranks(edges, rounds)
      .orderBy(col("rank_micros").desc, col("id"))
      .limit(topK)
      .select(col("id").as("word"), col("rank_micros"))
  }
}
