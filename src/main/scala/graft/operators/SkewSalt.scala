package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew mitigation for aggregations: two-phase (salted) aggregation.
  * A hot key that would pin one reducer is split across `salts`
  * sub-keys for the partial aggregate, then combined in a second, tiny
  * aggregation — the classic remedy when AQE's skew handling can't help
  * (it only splits JOIN partitions, not aggregation groups).
  *
  * The salt is a deterministic hash of the whole row, so results are
  * reproducible (no rand()) and re-runs of a failed stage agree.
  */
object SkewSalt {

  /** Skew-resistant equi-join: the probe (fact) side gets a
    * deterministic row-hash salt in [0, salts), the build (dim) side
    * is replicated once per salt value, and the join runs on
    * (keys…, salt) — a hot join key's rows spread over `salts`
    * reducers instead of pinning one.
    *
    * When to reach for this at 100 TB: a broadcastable build side
    * never skews (no shuffle), and AQE's skew-join split handles most
    * sort-merge cases at runtime — salting is for the residue: a
    * build side too big to broadcast joined on keys whose hot-key
    * rows AQE can't split (e.g. the skew is in the FIRST shuffle of a
    * stage AQE has already planned, or the join must align with an
    * existing (key, salt) bucketing). Cost: build side × salts
    * replication — keep `salts` at the skew factor, not the cluster
    * size. Result is identical to `fact.join(dim, keys)` because each
    * fact row carries exactly one salt and every (key, salt) pair
    * exists on the build side.
    */
  def saltedEquiJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                     salts: Int = 16): DataFrame = {
    require(salts > 0)
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(struct(fact.columns.toIndexedSeq.map(col): _*)), lit(salts)))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    saltedFact
      .hint("merge") // force the shuffled path: salting a broadcast is a no-op
      .join(saltedDim, keys :+ "__salt")
      .drop("__salt")
  }

  /** groupBy(keys).agg(sum, count) resistant to hot keys. */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     salts: Int = 32): DataFrame = {
    require(salts > 0)
    val salted = df.withColumn("__salt",
      pmod(xxhash64(struct(df.columns.toIndexedSeq.map(col): _*)), lit(salts)))
    salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("cnt"))
  }

  /** The DIAGNOSTIC that decides whether the remedies above are worth
    * their cost: an exact key-skew report — the top-`topK` heaviest
    * keys (rows + corpus share in ppm) with the group-size
    * distribution (p50/p99/max, key count, row count) as context
    * columns on every row. This is what an engineer reads before
    * choosing broadcast vs AQE vs [[saltedEquiJoin]] for a 100 TB
    * join, and what a pipeline asserts on ("no key above 2% of the
    * corpus") before shipping a new corpus version.
    *
    * Scale shape — the reason this is an operator and not a notebook
    * `ORDER BY count(*) DESC`: one corpus-sized exchange (the per-key
    * count), then ALL remaining work runs on strictly smaller
    * domains: the top-k is a distributed TakeOrdered (per-partition
    * heaps, never a full sort of the key domain), and the exact
    * percentiles come from the SIZE HISTOGRAM (distinct group sizes —
    * thousands of values even when keys are billions), so no ordered
    * window ever sees the key domain. Percentile q is the smallest
    * size with cumulative key count >= ceil(q * n_keys) (rank-based,
    * integer-exact, no interpolation).
    *
    * int64 envelope: `n_rows * 1e6` needs the biggest single key
    * under ~9.2e12 rows; `99 * n_keys` needs n_keys under ~9.3e16 —
    * both beyond any real corpus. */
  def skewAudit(df: DataFrame, keys: Seq[String], topK: Int = 10): DataFrame =
    skewAuditFromSizes(
      df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n_rows")),
      keys, topK)

  /** [[skewAudit]]'s tail for an ALREADY-COUNTED per-key size table
    * (`keys…, n_rows`) — the entry point when the counts are
    * maintained incrementally (a streaming aggregation store, a
    * nightly per-key count table) rather than recomputed: auditing a
    * 100 TB corpus then costs only the key-domain-sized passes. */
  def skewAuditFromSizes(sizes: DataFrame, keys: Seq[String],
                         topK: Int = 10): DataFrame = {
    require(topK > 0)
    val hist = sizes.groupBy("n_rows").agg(count(lit(1)).as("__nk"))
    val tot = hist.agg(
      sum(col("n_rows") * col("__nk")).as("total_rows"),
      sum(col("__nk")).as("n_keys"),
      max(col("n_rows")).as("max_size"))
    // the histogram is size-domain-sized: a single-partition cumulative
    // window here is bounded by the number of DISTINCT group sizes
    val cum = hist.crossJoin(broadcast(tot))
      .withColumn("__cum", sum(col("__nk")).over(
        Window.orderBy("n_rows")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val stats = cum.agg(
      max(col("n_keys")).as("n_keys"),
      max(col("total_rows")).as("total_rows"),
      max(col("max_size")).as("max_size"),
      min(when(col("__cum") >= expr("(n_keys + 1) div 2"), col("n_rows")))
        .as("p50_size"),
      min(when(col("__cum") >= expr("(99 * n_keys + 99) div 100"),
        col("n_rows"))).as("p99_size"))
    val ord = col("n_rows").desc +: keys.map(col(_).asc)
    val top = sizes.orderBy(ord: _*).limit(topK)
      .withColumn("rank",
        row_number().over(Window.orderBy(ord: _*)).cast("long"))
    top.crossJoin(broadcast(stats))
      .withColumn("share_ppm", expr("n_rows * 1000000 div total_rows"))
      .select((keys.map(col) ++ Seq(col("rank"), col("n_rows"),
        col("share_ppm"), col("n_keys"), col("total_rows"),
        col("p50_size"), col("p99_size"), col("max_size"))): _*)
  }
}
