package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-behavior analytics over an event stream table: ordered funnel
  * conversion, cohort retention, and event-transition (Markov bigram)
  * matrices. These are the classic product-analytics operators a
  * reference ETL feeds downstream (the reference's activity tables are
  * exactly such an event log — reference `main.py:47-74` builds the
  * per-activity history this family aggregates).
  *
  * Scale design: every operator here shuffles ONCE on the entity key
  * (user) and computes per-entity state with unbounded-frame window
  * aggregates over that single exchange — no self-joins, no iteration,
  * no driver-side state. At 100 TB the exchange is the unavoidable
  * cost of "per-user history"; everything downstream of it is
  * map-side.
  */
object Behavior {

  /** Strictly-ordered funnel: for each user, the first `stages(0)`
    * event, then the first `stages(1)` event AFTER that, then the
    * first `stages(2)` after THAT, etc. Returns one row per user with
    * one nullable timestamp column per stage (`stage_0_ts …`) — a user
    * that never progresses past stage i has nulls from i+1 on.
    *
    * Each stage is one conditional `min` over the same user-partitioned
    * unbounded window, referencing the previous stage's materialized
    * column — N stages = N WindowExecs over ONE exchange (the windows
    * share partitioning and need no ordering), not N self-joins. This
    * is the shape that survives 100×: a billion users cost one shuffle
    * of the event log, and no per-stage join re-shuffles it.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val w = Window.partitionBy(userCol)
    val withStages = stages.zipWithIndex.foldLeft(events) {
      case (df, (stage, i)) =>
        val cond =
          if (i == 0) col(typeCol) === stage
          else col(typeCol) === stage && col(tsCol) > col(s"stage_${i - 1}_ts")
        df.withColumn(s"stage_${i}_ts", min(when(cond, col(tsCol))).over(w))
    }
    withStages
      .select(col(userCol) +: stages.indices.map(i => col(s"stage_${i}_ts")): _*)
      .distinct()
  }

  /** Weekly cohort retention: users bucketed by the ISO week of their
    * first event (the cohort), counted distinct in every later week
    * they reappear, keyed by (cohort_week, week_offset). The classic
    * retention triangle.
    *
    * One exchange on user for the first-event window, one aggregation
    * exchange on the (cohort, offset) pair — the minimum for this
    * result. `countDistinct` on the second exchange is exact; at
    * 100 TB swap in HLL ([[graft.functions.KmvSketch]] / Spark's
    * `approx_count_distinct`) per the documented sketch family.
    */
  def weeklyRetention(events: DataFrame, userCol: String,
                      tsCol: String): DataFrame = {
    val w = Window.partitionBy(userCol)
    events
      .withColumn("__first_ts", min(col(tsCol)).over(w))
      .select(col(userCol),
        date_trunc("week", col("__first_ts")).as("__cw"),
        date_trunc("week", col(tsCol)).as("__aw"))
      .select(col(userCol), col("__cw"),
        (datediff(col("__aw"), col("__cw")) / 7).cast("long").as("week_offset"))
      .groupBy(date_format(col("__cw"), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"))
      .agg(count_distinct(col(userCol)).as("n_users"))
  }

  /** Per-user event-type transition matrix (first-order Markov
    * bigrams): counts and row-normalized probabilities of
    * `prev_type → event_type` steps in each user's time-ordered
    * stream. Ordering ties break on `tieCol` so results are exact and
    * reproducible. Transition structure is the standard behavioral
    * fingerprint (bot detection, path analysis) and the same lag-shape
    * powers n-gram language modeling over token streams.
    *
    * One exchange on user (the lag window), one tiny aggregation on
    * the (prev, curr) pair — at most |types|² groups, so the second
    * exchange is negligible at any scale. The probability denominator
    * is a window over the aggregated matrix, not a re-scan.
    */
  def transitionMatrix(events: DataFrame, userCol: String, tsCol: String,
                       typeCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    val steps = events
      .withColumn("prev_type", lag(col(typeCol), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n"))
    val denom = Window.partitionBy("prev_type")
    steps.withColumn("p",
      round(col("n") / sum(col("n")).over(denom), 6))
  }

  /** Cohort lifetime-value triangle ([[weeklyRetention]] with the
    * VALUE dimension): per (first-activity cohort week, week offset)
    * cell — active users, revenue, cumulative revenue, and
    * cumulative value per COHORT member (denominator = the offset-0
    * cell, i.e. cohort size, since every member is active in their
    * first week by construction). The payback-curve table a
    * unit-economics dashboard plots.
    *
    * Exact integers: revenue arrives as cents, the per-user column
    * is a truncating division of exact sums — never an average of
    * doubles. Plan: the retention shape (one user exchange for the
    * first-event window, one (cohort, offset) aggregation) plus a
    * cohort-partitioned running sum over the OFFSET-SIZED cell table
    * — the windows after the aggregation touch hundreds of rows, not
    * the corpus; countDistinct swaps for a sketch at 100 TB (g34's
    * precedent). */
  def cohortValue(events: DataFrame, userCol: String, tsCol: String,
                  valueCents: Column): DataFrame = {
    val w = Window.partitionBy(userCol)
    val base = events
      .withColumn("__v", valueCents)
      .withColumn("__first_ts", min(col(tsCol)).over(w))
      .select(col(userCol),
        date_trunc("week", col("__first_ts")).as("__cw"),
        (datediff(date_trunc("week", col(tsCol)),
          date_trunc("week", col("__first_ts"))) / 7).cast("long")
          .as("week_offset"),
        col("__v"))
    val cells = base.groupBy(col("__cw"), col("week_offset"))
      .agg(count_distinct(col(userCol)).as("n_users"),
        sum(col("__v")).as("rev_cents"))
    val sz = Window.partitionBy("__cw")
    val cum = Window.partitionBy("__cw").orderBy("week_offset")
      .rowsBetween(Window.unboundedPreceding, 0)
    cells
      .withColumn("cum_rev_cents", sum(col("rev_cents")).over(cum))
      .withColumn("__size",
        max(when(col("week_offset") === 0, col("n_users"))).over(sz))
      .select(date_format(col("__cw"), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"), col("n_users"), col("rev_cents"),
        col("cum_rev_cents"),
        expr("cum_rev_cents div __size").as("cum_per_user_cents"))
  }

  /** First-order Markov next-event prediction, trained and scored in
    * one dataflow — the "is user behavior predictable / did the
    * sequence distribution shift" evaluation a curriculum or
    * sessionization change is gated on. Steps (consecutive event
    * pairs per user under the (tsCol, tieCol) total order) split by
    * `evalSide` ON THE SUCCESSOR row: training steps fit the argmax
    * transition model (most frequent next type per previous type,
    * ties broken lexicographically-min for cross-engine determinism);
    * eval steps score it. Per previous type: n_eval, n_predicted
    * (steps whose prev type the model knows — unseen prevs predict
    * nothing and score zero), n_correct, accuracy in exact ppm.
    *
    * Plan: ONE user-keyed window pass produces ALL steps (train and
    * eval split by a flag, the corpus is never scanned twice); the
    * model is a type-domain-sized aggregate that BROADCASTS back onto
    * the eval side — at any scale the join is a map-side hash probe,
    * the only exchanges are the window shuffle and the model's
    * aggregation. */
  def markovEval(events: DataFrame, userCol: String, tsCol: String,
                 typeCol: String, tieCol: String,
                 evalSide: Column): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    val steps = events
      .withColumn("__is_eval", evalSide)
      .withColumn("prev_type", lag(col(typeCol), 1).over(w))
      .filter(col("prev_type").isNotNull)
    val model = steps.filter(!col("__is_eval"))
      .groupBy(col("prev_type"), col(typeCol).as("__pred"))
      .agg(count(lit(1)).as("__n"))
    val rk = Window.partitionBy("prev_type")
      .orderBy(col("__n").desc, col("__pred").asc)
    val argmax = model.withColumn("__r", row_number().over(rk))
      .filter(col("__r") === 1).select(col("prev_type"), col("__pred"))
    steps.filter(col("__is_eval"))
      .join(broadcast(argmax), Seq("prev_type"), "left_outer")
      .groupBy("prev_type")
      .agg(count(lit(1)).as("n_eval"),
        sum(when(col("__pred").isNotNull, 1L).otherwise(0L))
          .as("n_predicted"),
        sum(when(col("__pred") === col(typeCol), 1L).otherwise(0L))
          .as("n_correct"))
      .withColumn("acc_ppm", expr("n_correct * 1000000 div n_eval"))
  }

  /** Pairwise association rules (the support/confidence/lift core of
    * Agrawal-Srikant Apriori at itemset depth 2) over per-basket
    * distinct item sets: for every DIRECTED item pair `a -> b`
    * co-present in at least one basket,
    * `support = n_joint/n_baskets`, `confidence = n_joint/n_a`,
    * `lift = n_joint*n_baskets/(n_a*n_b)` — all in exact integer ppm
    * (lift > 1e6 means positive association).
    *
    * Input is the LONG form (basketCols*, itemCol), one row per
    * basket-item observation; duplicates collapse first. Plan:
    * one distinct + one groupBy on the basket key; ordered pairs
    * come from an in-row array transform (k distinct items -> k(k-1)
    * pairs, never a basket self-join); item marginals broadcast back
    * onto the pair table (item domains are small by construction —
    * this is g37's copresence discipline extended with the rule
    * arithmetic). Baskets with one item contribute marginals and the
    * denominator but no pairs.
    *
    * Exact-int64 envelope: `n_joint * n_baskets * 1e6` caps
    * `n_baskets` at ~3e6 for the single-expression lift; past that,
    * step the division (`(n_joint*1e6 div n_a) * n_baskets div n_b`)
    * or compute lift on the ALREADY-AGGREGATED pair table in double —
    * the pair table is domain-sized, not corpus-sized, so precision
    * policy is a cheap final-projection choice. */
  def associationRules(df: DataFrame, basketCols: Seq[String],
                       itemCol: String): DataFrame = {
    require(basketCols.nonEmpty, "at least one basket key column")
    val bKeys = basketCols.map(col)
    val b = df.select(bKeys :+ col(itemCol).as("__item"): _*).distinct()
    val nB = b.select(bKeys: _*).distinct().agg(count(lit(1)).as("n_baskets"))
    val itemCounts = b.groupBy(col("__item")).agg(count(lit(1)).as("__ni"))
    val pairs = b.groupBy(bKeys: _*)
      .agg(array_sort(collect_list(col("__item"))).as("__items"))
      .filter(size(col("__items")) >= 2)
      .select(explode(expr(
        """flatten(transform(__items, a ->
             transform(filter(__items, x -> x != a), c ->
               named_struct('a', a, 'c', c))))""")).as("p"))
      .groupBy(col("p.a").as("antecedent"), col("p.c").as("consequent"))
      .agg(count(lit(1)).as("n_joint"))
    pairs
      .join(broadcast(itemCounts.select(col("__item").as("antecedent"),
        col("__ni").as("n_antecedent"))), Seq("antecedent"))
      .join(broadcast(itemCounts.select(col("__item").as("consequent"),
        col("__ni").as("n_consequent"))), Seq("consequent"))
      .crossJoin(broadcast(nB))
      .select(col("antecedent"), col("consequent"), col("n_joint"),
        col("n_antecedent"), col("n_consequent"), col("n_baskets"),
        expr("n_joint * 1000000 div n_baskets").as("support_ppm"),
        expr("n_joint * 1000000 div n_antecedent").as("confidence_ppm"),
        expr("n_joint * n_baskets * 1000000 div (n_antecedent * n_consequent)")
          .as("lift_ppm"))
  }

  /** Inter-arrival burstiness — the exact DISPERSION INDEX
    * (variance-to-mean ratio of gaps, Fano factor) per key: ~1e6 ppm
    * for a Poisson (memoryless) arrival stream, far above for bursty
    * traffic (sessions, bots, batch jobs), below for pacemaker-regular
    * streams. The bot/burst detector that complements [[Sessionize]]
    * (which needs a gap threshold; this MEASURES the gap structure).
    *
    * Exact integer arithmetic with cleared denominators:
    * gaps in whole minutes (`(us_i - us_{i-1}) div 60000000`, exact
    * int64 from micros), then with n = #gaps, S = Σd, Q = Σd²:
    *
    *   D_ppm = (n·Q - S²) · 1e6  div  (n·S)     [Var/Mean, minutes]
    *
    * (population variance and mean with the n² cleared). NULL when
    * S = 0 (all gaps sub-minute: dispersion undefined at this
    * resolution, not zero). int64 envelope: `n·Q·1e6 < 2^63` — holds
    * to ~9e12 gap-minutes-squared mass per key; past it, coarsen the
    * unit (hours), the index rescales linearly with the unit.
    *
    * One window pass (per-key lag) + one aggregation, both on the key
    * — a single exchange; the output is key-domain-sized. */
  def burstiness(events: DataFrame, keyCol: String, tsCol: String,
                 tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy("__us", "__tie")
    events
      .select(col(keyCol), unix_micros(col(tsCol)).as("__us"),
        col(tieCol).as("__tie"))
      .withColumn("__prev", lag(col("__us"), 1).over(w))
      .filter(col("__prev").isNotNull)
      .withColumn("__d", expr("(__us - __prev) div 60000000"))
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("__d")).as("sum_min"),
        sum(col("__d") * col("__d")).as("sum_min2"))
      .withColumn("disp_ppm", expr(
        """CASE WHEN sum_min = 0 THEN CAST(NULL AS BIGINT)
           ELSE (n_gaps * sum_min2 - sum_min * sum_min) * 1000000
                div (n_gaps * sum_min) END"""))
  }

  /** Kaplan-Meier life table — the right-censored generalization of
    * [[weeklyRetention]] (fixed-offset cohort rates are WRONG when
    * observation windows differ: a user who signed up yesterday hasn't
    * "failed to purchase", they're censored). Input is the per-subject
    * table (`durCol`: int64 time-to-event-or-censoring,
    * `observedCol`: boolean, true = the event happened at durCol,
    * false = observation ended there): one row per EVENT time t with
    *
    *   n_events(t)   — subjects with the event exactly at t
    *   n_risk(t)     — subjects still under observation at t
    *                   (duration >= t: the standard convention that
    *                   same-time censorings count as at risk)
    *   n_censored(t) — censorings exactly at t (context column)
    *
    * All exact int64 counts — the estimator's product
    * `S(t) = prod(1 - d_i/r_i)` is a ratio the CALLER forms at
    * whatever precision they need; publishing the (d, r) table keeps
    * the gate engine-exact (the same publish-the-rational discipline
    * as g35's Gini).
    *
    * Scale shape: the caller's subject-building groupBy is the only
    * corpus-sized exchange; this operator aggregates subjects to the
    * DURATION domain (days/weeks — bounded by the observation span)
    * and runs one cumulative window there, exactly
    * [[SkewSalt.skewAudit]]'s histogram ladder. */
  def kmTable(subjects: DataFrame, durCol: String,
              observedCol: String): DataFrame = {
    val perDur = subjects.groupBy(col(durCol).as("t"))
      .agg(count(lit(1)).as("__n_at"),
        sum(when(col(observedCol), 1L).otherwise(0L)).as("n_events"),
        sum(when(col(observedCol), 0L).otherwise(1L)).as("n_censored"))
    // duration-domain cumulative: risk at t = subjects with dur >= t
    perDur
      .withColumn("n_risk",
        sum(col("__n_at")).over(
          Window.orderBy(col("t").asc).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing))
          - coalesce(sum(col("__n_at")).over(
            Window.orderBy(col("t").asc).rowsBetween(
              Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("n_events") > 0)
      .select(col("t"), col("n_risk"), col("n_events"), col("n_censored"))
  }
}
