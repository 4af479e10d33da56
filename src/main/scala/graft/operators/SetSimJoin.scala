package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join by PREFIX FILTERING (Bayardo,
  * Ma & Srikant's All-Pairs, WWW'07; Xiao et al.'s PPJoin) — the
  * EXACT, recall-1.0 counterpart to the MinHash/LSH chain (d2/d3/d5):
  * LSH trades recall for candidate volume; prefix filtering keeps
  * recall exact and still never compares all pairs.
  *
  * The pruning identity: order every set by one GLOBAL token order
  * (rarest first — ascending document frequency, ties by token). If
  * two sets have Jaccard >= tau, their overlap must be at least
  * ceil(tau/(1+tau) * (|a|+|b|)) >= ceil(tau*|a|), so each set's first
  * `|s| - ceil(tau*|s|) + 1` tokens (its PREFIX) must hit the other
  * set — a pair sharing NO prefix token cannot reach tau, and the
  * candidate join runs on prefix tokens only. Rarest-first ordering
  * makes prefixes the low-frequency tail of the vocabulary, so the
  * token-key join explodes least where df is highest.
  *
  * Every threshold decision is EXACT INTEGER arithmetic: tau is the
  * rational tauNum/tauDen, prefix length uses integer ceil division,
  * and the accept test is `inter * tauDen >= tauNum * union` — no
  * float cut to disagree across engines (the gate's oracle is a
  * brute-force all-overlapping-pairs join, so hash equality IS the
  * completeness proof for the prefix filter).
  *
  * 100 TB: the df table is one gram-key exchange with map-side
  * combine; per-doc ordering is one groupBy on doc_id; the candidate
  * join shuffles PREFIX tokens only (a tau-controlled fraction of the
  * corpus gram volume, biased to rare tokens by construction); exact
  * verification touches candidates only, reading the two token arrays
  * carried on the pair row — no second corpus scan, no all-pairs
  * stage anywhere.
  */
object SetSimJoin {

  /** `docs`: (doc_id BIGINT, text STRING). Word-`k`-shingle sets,
    * Jaccard >= tauNum/tauDen, pairs doc_a < doc_b with exact
    * intersection/union sizes and the rounded ratio. */
  def jaccardSelfJoin(docs: DataFrame, k: Int, tauNum: Int,
                      tauDen: Int): DataFrame = {
    require(tauNum > 0 && tauDen > 0 && tauNum <= tauDen,
      "tau must be a rational in (0, 1]")
    val sh = Dedup.wordShingles(docs, k).distinct()
    val dfT = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    // per-doc shingle list in the global (df asc, token asc) order;
    // array_sort on (df, sh) structs IS that order, no window needed
    val ordered = sh.join(dfT, "sh")
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("df"), col("sh")))).as("arr"))
      .select(col("doc_id"),
        transform(col("arr"), e => e.getField("sh")).as("toks"),
        size(col("arr")).as("n"))
    // prefix length n - ceil(tau*n) + 1, integer ceil division
    // (`div`, not `/` — Column./ is floating division)
    val plen =
      col("n") - expr(s"(n * $tauNum + ${tauDen - 1}) div $tauDen") + 1
    // prefix tokens WITH set size and 0-based position: the PPJoin
    // length and positional filters run on the match occurrences
    // BEFORE the pair distinct, so the verify join (which hauls both
    // token arrays) only sees pairs that can still reach tau.
    // Exactness (ANY-pass is enough): for a true pair, its FIRST
    // common token in the global order sits in BOTH prefixes (any
    // earlier common token would precede it in both sorted arrays and
    // in both prefixes), and at that occurrence (pa, pb) every common
    // token occupies a position >= pa in a / >= pb in b, so
    // inter <= min(na-pa, nb-pb); with inter >= tau/(1+tau)*(na+nb)
    // the first occurrence passes both integer tests below, hence the
    // pair survives. Measured at sf0.1: 409k -> 137k candidate pairs,
    // output identical (oracle is the brute-force all-pairs join).
    val prefix = ordered.select(col("doc_id"), col("n"),
      posexplode(slice(col("toks"), lit(1), plen.cast("int"))))
      .toDF("doc_id", "n", "pos", "ptok")
    val cands = prefix
      .select(col("doc_id").as("doc_a"), col("n").as("na"),
        col("pos").as("pa"), col("ptok"))
      .join(prefix.select(col("doc_id").as("doc_b"), col("n").as("nb"),
        col("pos").as("pb"), col("ptok")), "ptok")
      .filter(col("doc_a") < col("doc_b"))
      // length: inter <= min(na, nb) must reach tau/(1+tau)*(na+nb).
      // Arithmetic in LONG (round-17 advice): set sizes are ints, and
      // with ANSI off an IntegerType n*(tauNum+tauDen) product would
      // overflow SILENTLY near Int.MaxValue/tauDen shingles and drop
      // true pairs — same long discipline as the verify stage's
      // inter_n/union_n.
      .filter(least(col("na"), col("nb")).cast("long") * (tauNum + tauDen) >=
        (col("na").cast("long") + col("nb")) * tauNum)
      // positional: common tokens from this occurrence onward
      .filter(least(col("na") - col("pa"), col("nb") - col("pb")).cast("long") *
        (tauNum + tauDen) >= (col("na").cast("long") + col("nb")) * tauNum)
      .select("doc_a", "doc_b").distinct()
    val a = ordered.select(col("doc_id").as("doc_a"), col("toks").as("ta"),
      col("n").as("na"))
    val b = ordered.select(col("doc_id").as("doc_b"), col("toks").as("tb"),
      col("n").as("nb"))
    cands.join(a, "doc_a").join(b, "doc_b")
      .withColumn("inter_n",
        size(array_intersect(col("ta"), col("tb"))).cast("long"))
      .withColumn("union_n",
        (col("na") + col("nb")).cast("long") - col("inter_n"))
      .filter(col("inter_n") * tauDen >= col("union_n") * tauNum)
      .select(col("doc_a"), col("doc_b"), col("inter_n"), col("union_n"),
        round(col("inter_n").cast("double") / col("union_n"), 6)
          .as("jaccard_r"))
  }

  /** CONTAINMENT self-join: pairs (a, b), a ≠ b, with
    * `|A ∩ B| / |A| >= tau` — Broder's second measure. Resemblance
    * (Jaccard) misses the quote/excerpt case: a 50-shingle doc fully
    * embedded in a 5000-shingle doc has Jaccard ~0.01 but containment
    * 1.0, and "is this document swallowed by another" is exactly the
    * near-dup question for quotations, boilerplate inclusions and
    * version supersets in a training corpus.
    *
    * Containment is asymmetric, so the prefix filter is too: the
    * overlap bound is `ceil(tau·|A|)` (only A's size matters), hence
    * only the CONTAINED side prunes to a prefix — the container side
    * must index ALL its tokens (any of B's tokens might be the one
    * A's prefix hits). Candidate join: A-prefix tokens × B-full
    * tokens; verification is the same exact integer test
    * (`inter · tauDen >= tauNum · |A|`). The full-side index is
    * corpus-token-sized — d11's gram-index scale bound, one exchange
    * with map-side distinct — while the prefix side keeps the
    * rare-token bias that makes All-Pairs work.
    */
  def containmentSelfJoin(docs: DataFrame, k: Int, tauNum: Int,
                          tauDen: Int): DataFrame = {
    require(tauNum > 0 && tauDen > 0 && tauNum <= tauDen,
      "tau must be a rational in (0, 1]")
    val sh = Dedup.wordShingles(docs, k).distinct()
    val dfT = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    val ordered = sh.join(dfT, "sh")
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("df"), col("sh")))).as("arr"))
      .select(col("doc_id"),
        transform(col("arr"), e => e.getField("sh")).as("toks"),
        size(col("arr")).as("n"))
    val plen =
      col("n") - expr(s"(n * $tauNum + ${tauDen - 1}) div $tauDen") + 1
    // PPJoin-style length + positional pruning, asymmetric form (the
    // jaccardSelfJoin rationale, containment bounds): a true pair's
    // FIRST common token is in A's prefix (common tokens precede it in
    // the sorted arrays) and is always among B's full exploded tokens,
    // and from that occurrence on inter <= min(na-pa, nb-pb); with
    // inter*tauDen >= tauNum*na the occurrence passes, so ANY-pass
    // filtering before the distinct loses no true pair. The full side
    // explodes the ORDERED array (same token set as `sh`) to carry
    // positions.
    val prefix = ordered.select(col("doc_id").as("doc_a"),
      col("n").as("na"),
      posexplode(slice(col("toks"), lit(1), plen.cast("int"))))
      .toDF("doc_a", "na", "pa", "tok")
    val full = ordered.select(col("doc_id").as("doc_b"),
      col("n").as("nb"), posexplode(col("toks")))
      .toDF("doc_b", "nb", "pb", "tok")
    val cands = prefix.join(full, "tok")
      .filter(col("doc_a") =!= col("doc_b"))
      // length: inter <= nb must reach tau*na (LONG arithmetic — the
      // jaccardSelfJoin overflow rationale)
      .filter(col("nb").cast("long") * tauDen >= col("na").cast("long") * tauNum)
      // positional: common tokens from this occurrence onward
      .filter(least(col("na") - col("pa"), col("nb") - col("pb")).cast("long") *
        tauDen >= col("na").cast("long") * tauNum)
      .select("doc_a", "doc_b").distinct()
    val a = ordered.select(col("doc_id").as("doc_a"), col("toks").as("ta"),
      col("n").as("na"))
    val b = ordered.select(col("doc_id").as("doc_b"), col("toks").as("tb"))
    cands.join(a, "doc_a").join(b, "doc_b")
      .withColumn("inter_n",
        size(array_intersect(col("ta"), col("tb"))).cast("long"))
      .filter(col("inter_n") * tauDen >= col("na").cast("long") * tauNum)
      .select(col("doc_a"), col("doc_b"), col("inter_n"),
        col("na").cast("long").as("na"),
        round(col("inter_n").cast("double") / col("na"), 6)
          .as("containment_r"))
  }
}
