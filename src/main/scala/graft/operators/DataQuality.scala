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
}
