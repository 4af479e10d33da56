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
