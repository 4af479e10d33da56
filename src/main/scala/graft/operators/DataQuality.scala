package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality auditing (the Deequ/Great-Expectations
  * shape, re-expressed as plain aggregation plans): a rule set over a
  * table compiles to ONE scan, and every constraint class the
  * verification frameworks ship — bound/domain predicates, key
  * uniqueness, referential integrity — emits the same uniform
  * (rule, n_checked, n_violations) row, so audits union into one
  * gateable report. An ingest pipeline runs this before committing a
  * batch; a violation count moving from its baseline IS the alert
  * (compose with [[Drift]] for distributional change, x7's checksum
  * for corruption).
  *
  * Scale shapes, per constraint class:
  *  - predicate rules: ALL rules fold into a single aggregation over
  *    one scan (`sum(when(violation, 1))` per rule + one count) — k
  *    rules cost one pass, never k passes; partial aggregation makes
  *    the exchange one row per partition.
  *  - uniqueness: exact `count - count_distinct(keys)` (one Expand
  *    exchange); at 100 TB the KMV/HLL sketch swaps in for the
  *    distinct half (g21's pattern) when an approximate dup count
  *    suffices for alerting.
  *  - referential integrity: a LEFT ANTI join of child keys against
  *    the parent key set — broadcast when the parent is a dimension;
  *    at fact-fact scale it rides a bloom prefilter (j8's pattern)
  *    so only candidate misses shuffle.
  */
object DataQuality {

  /** The audit's aggregation half: one count + one conditional sum
    * per rule — fold these into ANY aggregation (a batch `df.agg`, a
    * streaming groupBy, an incremental-agg snapshot). */
  def auditAggs(rules: Seq[(String, Column)]): Seq[Column] =
    count(lit(1)).as("__n") +: rules.map { case (n, v) =>
      sum(when(v, 1L).otherwise(0L)).as(s"__v_$n")
    }

  /** The audit's report half: unpivot a one-row aggregate produced by
    * [[auditAggs]] into uniform (rule, n_checked, n_violations). */
  def report(aggedRow: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    val stacked = rules.map { case (n, _) => s"'$n', `__v_$n`" }.mkString(", ")
    aggedRow.select(
        expr(s"stack(${rules.size}, $stacked) AS (rule, n_violations)"),
        col("__n").as("n_checked"))
      .select("rule", "n_checked", "n_violations")
  }

  /** All predicate rules in ONE scan: `rules` maps rule name → a
    * VIOLATION predicate (true = row breaks the rule). Emits one
    * (rule, n_checked, n_violations) row per rule. */
  def audit(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    val aggs = auditAggs(rules)
    report(df.agg(aggs.head, aggs.tail: _*), rules)
  }

  /** Key-uniqueness constraint: n_violations = rows beyond the first
    * per key (0 iff `keys` is a primary key). */
  def uniqueness(df: DataFrame, name: String, keys: Seq[String]): DataFrame =
    df.agg(count(lit(1)).as("__n"),
        count_distinct(col(keys.head), keys.tail.map(col): _*).as("__d"))
      .select(lit(name).as("rule"), col("__n").as("n_checked"),
        (col("__n") - col("__d")).as("n_violations"))

  /** Referential-integrity constraint: child rows whose `childKey`
    * has no match in the parent's `parentKey` set. */
  def referential(child: DataFrame, parent: DataFrame, name: String,
                  childKey: String, parentKey: String): DataFrame = {
    val viol = child
      .join(parent.select(col(parentKey)),
        child(childKey) === parent(parentKey), "left_anti")
      .agg(count(lit(1)).as("__v"))
    child.agg(count(lit(1)).as("__n")).crossJoin(viol)
      .select(lit(name).as("rule"), col("__n").as("n_checked"),
        col("__v").as("n_violations"))
  }

  /** Set-level confusion report: candidates vs ground truth as KEY
    * SETS (pair sets for a dedup index, id sets for a filter) —
    * n_candidates / n_truth / n_hit plus exact-ppm precision,
    * recall, and F1 (`2*hit/(cand+truth)` — the harmonic mean's
    * rational identity, no float division). NULL (undefined, not 0)
    * when a denominator is empty. The one-row gate an index build is
    * judged by — [[graft.operators.Ann.recallAtK]]'s unordered-set
    * sibling.
    *
    * Both inputs deduplicate first; plan is one semi-join + three
    * single-row aggregates over key-projected tables. Candidates and
    * truth must use the SAME key normalization (e.g. pairs ordered
    * a < b) — this reports on sets, it does not canonicalize them. */
  def setConfusion(candidates: DataFrame, truth: DataFrame,
                   keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "at least one key column")
    val c = candidates.select(keys.map(col): _*).distinct()
    val tr = truth.select(keys.map(col): _*).distinct()
    val nc = c.agg(count(lit(1)).as("n_candidates"))
    val nt = tr.agg(count(lit(1)).as("n_truth"))
    val nh = c.join(tr, keys, "left_semi").agg(count(lit(1)).as("n_hit"))
    nc.crossJoin(nt).crossJoin(nh).select(
      col("n_candidates"), col("n_truth"), col("n_hit"),
      expr("""CASE WHEN n_candidates = 0 THEN CAST(NULL AS BIGINT)
              ELSE n_hit * 1000000 div n_candidates END""")
        .as("precision_ppm"),
      expr("""CASE WHEN n_truth = 0 THEN CAST(NULL AS BIGINT)
              ELSE n_hit * 1000000 div n_truth END""").as("recall_ppm"),
      expr("""CASE WHEN n_candidates + n_truth = 0 THEN CAST(NULL AS BIGINT)
              ELSE 2 * n_hit * 1000000 div (n_candidates + n_truth) END""")
        .as("f1_ppm"))
  }

  /** Cohen's kappa (Cohen 1960) between two binary raters — the
    * label-agreement audit a labeling pipeline runs before trusting
    * annotations (two heuristic quality classifiers, a model vs a
    * rule, two annotator pools): observed agreement corrected for the
    * agreement two INDEPENDENT raters with the same marginals would
    * reach by chance.
    *
    * One scan, one 4-counter aggregation (partial-combined to a
    * single row), then pure integer arithmetic:
    * `kappa = (n*agree - a1*b1 - a0*b0) / (n^2 - a1*b1 - a0*b0)`,
    * published in exact parts-per-million — negative when agreement
    * is WORSE than chance, NULL when the chance term saturates (both
    * raters constant: kappa is undefined, not 0). Exact-int64
    * envelope: `n < ~3e6` keeps `n^2 * 1e6` inside int64; beyond
    * that, audit a hash-sampled stratum ([[graft.operators.Sampling]])
    * — agreement is a RATE, sampling it is sound, unlike the dedup
    * joins where every row must be seen. */
  /** Classifier calibration curve: bucket an integer score and
    * report the observed positive rate per bucket — the reliability
    * diagram's table form, the check that a quality classifier's
    * score MEANS something before it gates a corpus (a calibrated
    * score's rate rises monotonically with the bucket; a flat curve
    * says the score carries no signal). One scan + one bucket-count
    * aggregation, domain-sized output.
    *
    * `score + shift` must be non-negative (shift by the score's
    * documented lower bound) so the truncating bucket division is a
    * true floor — the same negative-truncation discipline as g33's
    * ppm shares. Exact integers end to end. */
  def calibrationCurve(df: DataFrame, score: Column, label: Column,
                       shift: Long, width: Long): DataFrame = {
    require(width >= 1, "bucket width must be >= 1")
    df.withColumn("__s", score + lit(shift))
      .withColumn("bucket", expr(s"__s div ${width}L"))
      .withColumn("__l", label)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        sum(when(col("__l"), 1L).otherwise(0L)).as("n_pos"))
      .withColumn("pos_rate_ppm", expr("n_pos * 1000000 div n"))
  }

  def agreementKappa(df: DataFrame, raterA: Column, raterB: Column): DataFrame =
    df.agg(
        count(lit(1)).as("n"),
        sum(when(raterA, 1L).otherwise(0L)).as("__a1"),
        sum(when(raterB, 1L).otherwise(0L)).as("__b1"),
        sum(when(raterA === raterB, 1L).otherwise(0L)).as("n_agree"))
      .withColumn("__pe_num",
        col("__a1") * col("__b1") +
          (col("n") - col("__a1")) * (col("n") - col("__b1")))
      .select(col("n"), col("n_agree"),
        expr("n_agree * 1000000 div n").as("po_ppm"),
        expr("__pe_num * 1000000 div (n * n)").as("pe_ppm"),
        expr("""CASE WHEN n * n = __pe_num THEN CAST(NULL AS BIGINT)
                ELSE (n * n_agree - __pe_num) * 1000000
                     div (n * n - __pe_num) END""").as("kappa_ppm"))
}
