package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling/mixing operators. */
object Sampling {

  /** Leakage-free train/val/test SPLIT by GROUP: every member of a
    * group (domain, source, cluster id) lands in the same split, so
    * near-duplicates sharing a group can never straddle train and
    * eval. Milli-thresholds (train 800 = 80%); assignment is 3 md5
    * nibbles of the group key cross-multiplied exactly like
    * [[weightedMix]] — deterministic, engine-exact, no shuffle (a
    * per-row projection). */
  def groupSplit(df: DataFrame, groupCol: String,
                 trainMilli: Long = 800L, valMilli: Long = 100L,
                 salt: String = "split"): DataFrame = {
    def nib(i: Int) =
      expr(s"instr('0123456789abcdef', substr(__sph, $i, 1))").cast("long") - 1
    df.withColumn("__sph", md5(concat(lit(s"$salt|"), col(groupCol).cast("string"))))
      .withColumn("__spv", nib(1) * 256 + nib(2) * 16 + nib(3))
      .withColumn("split",
        when(col("__spv") * 1000 < lit(trainMilli) * 4096, "train")
          .when(col("__spv") * 1000 < lit(trainMilli + valMilli) * 4096, "val")
          .otherwise("test"))
      .drop("__sph", "__spv")
  }

  /** Per-source token BUDGET capping — corpus curation under a token
    * quota: within each source, docs are taken in deterministic hash
    * order until the budget is exhausted (the doc that crosses the
    * line is kept — budgets are targets, not hard ceilings). One
    * window pass keyed on the source: the running token total BEFORE
    * each doc decides admission, so admission is order-stable and
    * engine-exact (pure integers). */
  def tokenBudget(docs: DataFrame, budgetTokens: Long,
                  sourceCol: String = "source", salt: String = "tb"): DataFrame = {
    val toks = size(split(col("text"), " ")).cast("long")
    val h = md5(concat(lit(s"$salt|"), col("doc_id").cast("string")))
    val w = Window.partitionBy(sourceCol).orderBy("__tbh", "doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("__tbh", h)
      .withColumn("n_tok", toks)
      .withColumn("tok_before", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .filter(col("tok_before") < budgetTokens)
      .drop("__tbh")
  }

  /** [[tokenBudget]]'s INCREMENTAL form: admission resumes from a
    * carried per-source consumed-token state (`consumed(sourceCol,
    * consumed_tok)` — in production the tiny table the previous batch
    * run wrote). The running total inside the new batch starts at the
    * carried value, so processing the corpus in N batches admits
    * exactly the docs ONE batch over the concatenation would admit
    * (same window order within each batch, batches in arrival order)
    * — the incremental-family contract (d15/d18/d21/g18), gated by
    * e11 against the single-pass rebuild. The consumed state counts
    * ALL quality docs the window saw (tokenBudget's accumulate-
    * then-cut semantics), not only admitted ones. One broadcast of
    * the source-cardinality state; no rescan of prior batches. */
  def tokenBudgetResume(docs: DataFrame, budgetTokens: Long,
                        consumed: DataFrame, sourceCol: String = "source",
                        salt: String = "tb"): DataFrame = {
    val toks = size(split(col("text"), " ")).cast("long")
    val h = md5(concat(lit(s"$salt|"), col("doc_id").cast("string")))
    val w = Window.partitionBy(sourceCol).orderBy("__tbh", "doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("__tbh", h)
      .withColumn("n_tok", toks)
      .withColumn("__run", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .join(broadcast(consumed), Seq(sourceCol), "left_outer")
      .withColumn("tok_before",
        col("__run") + coalesce(col("consumed_tok"), lit(0L)))
      .filter(col("tok_before") < budgetTokens)
      .drop("__tbh", "__run", "consumed_tok")
  }

  /** [[tokenBudget]] with PER-SOURCE budgets — the admission stage
    * fed by [[waterfillAllocation]]'s caps (the two halves of a
    * budgeted corpus build: fairness decides the caps, this enforces
    * them doc by doc). Same deterministic md5 admission order and the
    * same accumulate-then-cut boundary rule as [[tokenBudget]]
    * (`tok_before < alloc`: the doc crossing the cap is admitted), so
    * a source whose alloc equals its supply keeps every doc. `alloc`:
    * (sourceCol, alloc) — domain-sized, broadcast.
    *
    * A source ABSENT from `alloc` means "admit nothing" — made
    * explicit with a left join defaulting the missing alloc to 0 (so
    * every doc of that source fails `tok_before < 0 + ...` = false),
    * not an inner join that silently drops the rows after the window
    * pass already paid for them. Same output, stated semantics. */
  def tokenBudgetAllocated(docs: DataFrame, alloc: DataFrame,
                           sourceCol: String = "source",
                           salt: String = "tb"): DataFrame = {
    val toks = size(split(col("text"), " ")).cast("long")
    val h = md5(concat(lit(s"$salt|"), col("doc_id").cast("string")))
    val w = Window.partitionBy(sourceCol).orderBy("__tbh", "doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("__tbh", h)
      .withColumn("n_tok", toks)
      .withColumn("tok_before", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .join(broadcast(alloc.select(col(sourceCol), col("alloc"))),
        Seq(sourceCol), "left_outer")
      .withColumn("alloc", coalesce(col("alloc"), lit(0L)))
      .filter(col("tok_before") < col("alloc"))
      .drop("__tbh")
  }

  /** Water-filling (max-min fair) budget allocation across domains —
    * the OTHER half of the mixing toolkit: [[tokenBudget]] decides
    * WHICH docs survive a per-source cap; this decides WHAT the caps
    * should be. Given per-domain supplies and a total token budget,
    * find the unique water level `cap` with
    * `sum(min(supply_d, cap)) <= budget` maximal — small domains keep
    * everything, large domains are clipped to the common level (the
    * max-min fairness allocation; same arithmetic as progressive
    * filling). This is how a pretraining mix keeps low-resource
    * domains intact while spending a fixed token budget.
    *
    * EXACT integer arithmetic: sort domains by supply asc, prefix-sum;
    * the binding position is the first i with
    * `P_i + (n-i)*s_i > budget`, and `cap = (budget - P_{i-1}) div
    * (n-i+1)` — one truncating division, identical in both engines
    * (the quotient is non-negative: minimality of i gives
    * `P_{i-1} <= budget`). No binding position (total supply within
    * budget) → cap NULL, every domain keeps its full supply.
    *
    * Scale shape: the input is the DOMAIN-sized supply table (the
    * caller's corpus groupBy is the only corpus-sized work), so the
    * ordered window here is bounded by the domain count — the same
    * boundedness ladder as [[SkewSalt.skewAudit]]'s size histogram.
    * Output: (key, supply, budget, cap, alloc). */
  def waterfillAllocation(supplies: DataFrame, keyCol: String,
                          supplyCol: String, budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0 (got $budget)")
    waterfillCore(supplies, keyCol, supplyCol, lit(budget))
  }

  /** [[waterfillAllocation]] with the budget expressed as a SHARE of
    * total supply (`total * numer div denom`, e.g. 9/10 = spend 90%)
    * — keeps the whole computation declarative (no driver-side action
    * to learn the total first), so the same query text is correct at
    * every corpus scale.
    *
    * Int64 envelope (the burstiness/skewAudit convention): the
    * intermediate is `total_supply * numer`, so the caller must keep
    * `tot * numer < 2^63` — the fraction is gcd-reduced here first,
    * which makes every sane ratio (9/10, 1/2, 3/4) a single-digit
    * multiplier; 100 TB is ~2.5e13 tokens, × 9 ≈ 2.3e14 ≪ 9.2e18,
    * four orders of magnitude of headroom even at numer ~ 10^4. */
  def waterfillAllocationShare(supplies: DataFrame, keyCol: String,
                               supplyCol: String, numer: Long,
                               denom: Long): DataFrame = {
    require(numer >= 0 && denom > 0, s"bad share $numer/$denom")
    val g = java.math.BigInteger.valueOf(numer)
      .gcd(java.math.BigInteger.valueOf(denom)).longValueExact()
    val (nn, dd) = if (g > 1) (numer / g, denom / g) else (numer, denom)
    waterfillCore(supplies, keyCol, supplyCol,
      expr(s"__tot * $nn div $dd"))
  }

  /** Executable bound on [[waterfillCore]]'s global ordered window:
    * the supply table is DOMAIN-sized by contract (sources, not
    * docs); past ~1M domains the single-partition rank becomes the
    * bottleneck and the caller has grouped by the wrong key — fail
    * loudly instead of silently serializing. */
  val WaterfillMaxDomains: Long = 1L << 20

  private def waterfillCore(supplies: DataFrame, keyCol: String,
                            supplyCol: String,
                            budgetOf: org.apache.spark.sql.Column): DataFrame = {
    val ord = Window.orderBy(col(supplyCol).asc, col(keyCol).asc)
    val stats = supplies.agg(count(lit(1)).cast("long").as("__n"),
      sum(col(supplyCol)).as("__tot"))
    // The domain-cardinality contract rides inside the consumed __b
    // expression (assert_true is NULL when the predicate holds, so
    // + coalesce(...) leaves the budget value untouched) — a
    // standalone assert column would be pruned as unused.
    val nGuard = coalesce(assert_true(
      col("__n") <= lit(WaterfillMaxDomains),
      concat(lit("waterfill: "), col("__n").cast("string"),
        lit(s" domains exceed the $WaterfillMaxDomains bound for the " +
          "global ordered window; group supplies by a coarser key")))
      .cast("long"), lit(0L))
    val base = supplies
      .withColumn("__i", row_number().over(ord).cast("long"))
      .withColumn("__p", sum(col(supplyCol)).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(stats))
      .withColumn("__b", budgetOf + nGuard)
    val bind = base
      .filter(col("__p") + (col("__n") - col("__i")) * col(supplyCol)
        > col("__b"))
      .agg(min(struct(col("__i").as("i"),
        (col("__p") - col(supplyCol)).as("pprev"),
        (col("__n") - col("__i") + lit(1L)).as("rem"),
        col("__b").as("b"))).as("__bind"))
      .select(expr(
        "CAST((__bind.b - __bind.pprev) div __bind.rem AS BIGINT)").as("cap"))
    base.crossJoin(broadcast(bind))
      .select(col(keyCol), col(supplyCol).as("supply"),
        col("__b").as("budget"), col("cap"),
        when(col("cap").isNull, col(supplyCol))
          .otherwise(greatest(lit(0L), least(col(supplyCol), col("cap"))))
          .as("alloc"))
  }

  /** Data-mixing upsampler — the per-source mixture weights every
    * pretraining pipeline applies (wiki x3, web x0.5, ...): emits
    * floor(weight) copies of each doc plus one more with probability
    * frac(weight), deterministically.
    *
    * Weights are MILLI-weights (2500 = 2.5x) so everything stays exact
    * integers: the Bernoulli draw is 3 md5 nibbles of the doc id
    * (v in [0, 4096)), and the extra copy is taken iff
    * v * 1000 < rem * 4096 — an integer cross-multiply both engines
    * evaluate identically (no float thresholds).
    *
    * Scale shape: a projection + explode, no shuffle at all; the copy
    * explosion multiplies rows by the mixture factor exactly where a
    * writer would consume them. Output = input columns + n_copies +
    * copy_idx (1-based). Weight 0 drops the source. */
  def weightedMix(docs: DataFrame, milliWeights: Map[String, Long],
                  defaultMilli: Long = 1000L, sourceCol: String = "source",
                  salt: String = "mix"): DataFrame = {
    val w = milliWeights.toSeq.sortBy(_._1).foldLeft(lit(defaultMilli)) {
      case (acc, (s, mw)) => when(col(sourceCol) === s, lit(mw)).otherwise(acc)
    }
    def nib(i: Int) =
      expr(s"instr('0123456789abcdef', substr(__mixh, $i, 1))").cast("long") - 1
    docs
      .withColumn("__mixw", w)
      .withColumn("__mixh", md5(concat(lit(s"$salt|"), col("doc_id").cast("string"))))
      .withColumn("__mixv", nib(1) * 256 + nib(2) * 16 + nib(3))
      .withColumn("n_copies", expr("__mixw div 1000") +
        when(col("__mixv") * 1000 < (col("__mixw") % 1000) * 4096, 1L).otherwise(0L))
      // filter BEFORE explode: sequence(1, 0) would generate a
      // DESCENDING range, not an empty one
      .filter(col("n_copies") > 0)
      .withColumn("copy_idx", explode(sequence(lit(1L), col("n_copies"))))
      .drop("__mixw", "__mixh", "__mixv")
  }

  /** Weighted priority sampling (Duffield-Lund-Thorup, JACM 2007):
    * each row gets priority `q = w / u` with `u` uniform on (0,1],
    * and the sample is the top-k by priority — heavy rows are near-
    * certain members, light rows enter with probability ~ w/tau, and
    * subset-sum estimates from the sample are unbiased when the
    * (k+1)-th priority is used as the threshold tau (callers wanting
    * the estimator take k+1 rows and treat the last as tau; the
    * inclusion rule is `q > tau`).
    *
    * Everything is DETERMINISTIC and engine-replayable: `u` comes
    * from 20 bits of `md5(seed || key)` (the [[weightedMix]]/o5
    * discipline — no RNG state, reruns and other engines agree
    * bit-for-bit), and the priority is the exact int64
    * `w * 2^20 div (h + 1)`; ties break on the key. The floor
    * quantizes tau by at most one part in w, immaterial to the
    * estimator and exactly reproducible.
    *
    * Scale: a pure projection + a distributed top-k (Spark's
    * TakeOrderedAndProject: per-partition heaps of k, one k-sized
    * merge at the driver) — no shuffle of the corpus, no global
    * sort. Weights must be non-negative int64 with
    * `w * 2^20 < 2^63` (w < ~8.8e12). */
  def prioritySample(df: DataFrame, keyCol: String, weightCol: String,
                     k: Int, seed: String = "pri"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val u = expr(s"CAST(conv(substr(md5(concat('$seed|', " +
      s"CAST($keyCol AS STRING))), 1, 5), 16, 10) AS BIGINT) + 1")
    df.withColumn("__u", u)
      .withColumn("priority", expr(s"$weightCol * 1048576 div __u"))
      .orderBy(col("priority").desc, col(keyCol))
      .limit(k)
      .drop("__u")
  }

  /** Greedy k-center coreset (Gonzalez 1985's farthest-first
    * traversal, a 2-approximation to the k-center cover): seed at
    * the smallest id, then repeatedly pick the point FARTHEST from
    * its nearest already-selected center — the diversity-sampling
    * complement to [[prioritySample]]'s size bias (priority sampling
    * keeps what's heavy; this keeps what's DIFFERENT, the "cover the
    * embedding space with k exemplars" selection behind coreset
    * distillation and diverse eval-set picking).
    *
    * Exact and engine-replayable end to end when the coordinates are
    * integers (pair with [[Pca.randomProjection]]'s quantized
    * projections): distances are int64 squared-Euclidean, ties break
    * to the smallest id, and the seed is deterministic — the oracle
    * unrolls the k-1 picks. Coordinate envelope: |coord| < ~1e9
    * keeps the squared sum over a handful of dims inside int64.
    *
    * Plan: each of the k-1 rounds is ONE TakeOrdered(1) over the
    * point table against the LITERAL-encoded selected centers (k is
    * small; the distance expression is pure codegen — no join, no
    * shuffle, no crossJoin). k passes over a narrow projected table
    * is the canonical greedy k-center cost; cache the projection
    * when k is more than a few, and at extreme scale swap in the
    * sampled variant (pick the farthest of a hash-sampled candidate
    * set per round — same code, a `where` in front).
    *
    * Output: (pick_idx, id, radius_sq) in pick order; `radius_sq` is
    * the picked point's distance² to its nearest earlier center (the
    * cover radius achieved as of that pick; NULL for the seed). */
  /** O27: loss-aware MIXTURE REWEIGHTING — the DoReMi-shaped update
    * (Xie et al. 2023: upweight domains whose excess loss over the
    * corpus mean is largest) in engine-exact integer arithmetic. Per
    * group: `loss = sum(loss_ppm) div n` (the group's mean loss, exact
    * bigint); `excess = max(0, loss − corpus_loss)`; multiplier
    * `m = 1000 + min(excess div 100, 1000)` (DoReMi's exp(η·excess)
    * replaced by a clamped LINEAR step — a documented estimator
    * choice: exponentials cannot cross the oracle boundary under the
    * float-parity rules, the clamp bounds any one domain's step at 2×
    * exactly like DoReMi's per-round trust region, and iterating the
    * linear step converges to the same fixed-point ordering); new
    * weight `w_ppm = m * 1e6 div sum(m)` over a UNIFORM prior (a
    * non-uniform prior multiplies into m upstream). `etaDivisor` is
    * the learning rate's reciprocal in the loss column's own units —
    * size it so a meaningful excess lands in 1..1000 milli.
    *
    * Scale: one pass over the scored corpus (the loss column arrives
    * from whatever quality model scored it — t17's familiarity here),
    * a domain-sized aggregation, and a 1-row total broadcast back —
    * nothing corpus-sized after the groupBy. Output: (groupCol,
    * n_docs, loss_ppm, excess_ppm, mult_milli, new_w_ppm). */
  def mixtureReweight(scored: DataFrame, groupCol: String,
                      lossCol: String, etaDivisor: Long = 100L): DataFrame = {
    require(etaDivisor >= 1L, "etaDivisor must be >= 1")
    val grp = scored.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"), sum(col(lossCol)).as("__sum"))
      .select(col(groupCol), col("n_docs"),
        expr("__sum div n_docs").as("loss_ppm"), col("__sum"))
    val tot = grp.agg(sum(col("__sum")).as("__ts"), sum(col("n_docs")).as("__tn"))
      .select(expr("__ts div __tn").as("__corpus_loss"))
    val stepped = grp.crossJoin(broadcast(tot))
      .withColumn("excess_ppm",
        greatest(lit(0L), col("loss_ppm") - col("__corpus_loss")))
      .withColumn("mult_milli",
        lit(1000L) + least(expr(s"excess_ppm div ${etaDivisor}L"), lit(1000L)))
    val norm = stepped.agg(sum(col("mult_milli")).as("__msum"))
    stepped.crossJoin(broadcast(norm))
      .select(col(groupCol), col("n_docs"), col("loss_ppm"),
        col("excess_ppm"), col("mult_milli"),
        expr("mult_milli * 1000000 div __msum").as("new_w_ppm"))
  }

  /** TEMPERATURE-scaled mixture sampling (the multilingual/
    * multi-domain upsampling rule of mBERT/XLM-R/mT5: sample source i
    * with p_i ∝ n_i^α, α < 1, so head sources stop drowning the
    * tail): weights, ppm shares, and an integer token allocation
    * under `budgetTokens`, as an exact-integer executable contract —
    * the o-family discipline. α is expressed as `halvings` iterated
    * integer square roots (1 → α=1/2, the mT5 T=2 operating point;
    * 2 → α=1/4), and isqrt is computed EXACTLY in both engines by
    * correcting a float-sqrt seed with two integer comparisons, so
    * the gate never rides libm rounding. The remainder after integer
    * division goes to the largest-weight source (deterministic
    * largest-remainder-style closure: Σ alloc == budget exactly, no
    * drifting "approximately sums to budget" contract).
    *
    * Scale: one count/sum aggregate per source (map-side combinable)
    * then arithmetic over the BOUNDED source table — the corpus is
    * touched once; the mixture math costs nothing at any scale. */
  def temperatureMix(sourceTokens: DataFrame, budgetTokens: Long,
                     halvings: Int = 1): DataFrame = {
    require(halvings >= 1, "halvings must be >= 1")
    require(budgetTokens >= 0L, "budgetTokens must be >= 0")
    def isqrt(c: Column): Column = {
      val s = floor(sqrt(c.cast("double"))).cast("long")
      // exact integer sqrt from the float seed: one step up or down
      // covers the worst double-rounding error for inputs < 2^52
      val up = when((s + 1L) * (s + 1L) <= c, s + 1L).otherwise(s)
      when(up * up > c, up - 1L).otherwise(up)
    }
    val w = (1 to halvings).foldLeft(col("tokens"))((c, _) => isqrt(c))
    val weighted = sourceTokens.select(col("source"), col("tokens"))
      .withColumn("w", w)
    val tot = weighted.agg(sum(col("w")).as("__wsum"),
      max(struct(col("w"), col("source"))).as("__top"))
    val base = weighted.crossJoin(broadcast(tot))
      .withColumn("share_ppm", expr("w * 1000000 div __wsum"))
      .withColumn("__base", expr(s"w * ${budgetTokens}L div __wsum"))
    val allocated = base.agg(sum(col("__base")).as("__asum"))
    base.crossJoin(broadcast(allocated))
      .withColumn("alloc_tokens", col("__base") +
        when(col("source") === col("__top.source"),
          lit(budgetTokens) - col("__asum")).otherwise(lit(0L)))
      .select("source", "tokens", "w", "share_ppm", "alloc_tokens")
  }

  def kCenterCoreset(df: DataFrame, idCol: String, coordCols: Seq[String],
                     k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(coordCols.nonEmpty, "need at least one coordinate column")
    val spark = df.sparkSession
    val pts = df.select(col(idCol).cast("long").as("__id") +:
      coordCols.map(c => col(c).cast("long").as(c)): _*)
    val seed = pts.orderBy(col("__id")).limit(1).collect()(0)
    def coords(r: org.apache.spark.sql.Row): Seq[Long] =
      coordCols.indices.map(i => r.getLong(i + 1))
    var selected = Seq(seed)
    val out = scala.collection.mutable.ListBuffer[(Long, Long, Option[Long])]()
    out += ((0L, seed.getLong(0), None))
    var j = 1
    while (j < k) {
      val dists = selected.map { c =>
        val cs = coords(c)
        coordCols.zipWithIndex.map { case (cc, i) =>
          (col(cc) - lit(cs(i))) * (col(cc) - lit(cs(i)))
        }.reduce(_ + _)
      }
      val minDist = if (dists.size == 1) dists.head else least(dists: _*)
      val next = pts.withColumn("__d", minDist)
        .orderBy(col("__d").desc, col("__id")).limit(1).collect()(0)
      out += ((j.toLong, next.getLong(0),
        Some(next.getLong(next.length - 1))))
      selected :+= next
      j += 1
    }
    import spark.implicits._
    out.toSeq.toDF("pick_idx", "id", "radius_sq")
  }

  /** Multi-epoch token allocation under a data constraint (the budget
    * split of Muennighoff et al. 2023, "Scaling Data-Constrained
    * Language Models", as an executable contract): when the training
    * budget exceeds the fresh-token supply, sources are repeated —
    * but the e-th epoch over the same tokens is worth less than the
    * first. Each (source, epoch<=maxEpochs) unit carries weight
    * decayPpm^(e-1) (exact integer ppm powers — iterated
    * multiply-truncate, no float pow); units are consumed in value
    * order (epoch ASC since the weights strictly decay, then tokens
    * DESC, then source) while the cumulative token cost stays within
    * budget = total * budgetNum div budgetDen (prefix rule — the same
    * executable-greedy discipline as the waterfill allocator).
    * eff_tokens is the unit's decay-discounted contribution; the sum
    * over taken rows is the "effective data" the budget buys.
    *
    * Scale: one tiny aggregate per source (map-side combinable), a
    * sources x maxEpochs cross with two broadcast one-row tables, and
    * a cumulative window over that BOUNDED unit table (sources are a
    * curation-level handful; the corpus itself is never re-touched). */
  def epochAllocation(sourceTokens: DataFrame, budgetNum: Long,
                      budgetDen: Long, maxEpochs: Int,
                      decayPpm: Long): DataFrame = {
    val spark = sourceTokens.sparkSession
    import spark.implicits._
    val weights = (1 to maxEpochs).map { e =>
      (e.toLong, (1 until e).foldLeft(1000000L)((w, _) => w * decayPpm / 1000000L))
    }
    val epochs = weights.toDF("epoch", "w_ppm")
    val total = sourceTokens.agg(sum(col("tokens")).as("__tot"))
    val w = Window
      .orderBy(col("epoch"), col("tokens").desc, col("source"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sourceTokens.crossJoin(broadcast(epochs)).crossJoin(broadcast(total))
      .withColumn("__budget", expr(s"__tot * $budgetNum div $budgetDen"))
      .withColumn("cum_cost", sum(col("tokens")).over(w))
      .withColumn("taken", (col("cum_cost") <= col("__budget")).cast("long"))
      .withColumn("eff_tokens", when(col("taken") === 1L,
        expr("tokens * w_ppm div 1000000")).otherwise(lit(0L)))
      .select("source", "epoch", "tokens", "w_ppm", "cum_cost", "taken",
        "eff_tokens")
  }
}
