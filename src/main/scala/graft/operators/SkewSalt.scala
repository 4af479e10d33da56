package graft.operators

import org.apache.spark.sql.DataFrame
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
}
