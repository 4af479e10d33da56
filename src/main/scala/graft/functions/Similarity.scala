package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector-similarity primitives over `array<float/double>` embedding
  * columns, built entirely from codegen'd higher-order functions
  * (`zip_with`, `transform`, `aggregate`) — no UDFs, so the whole
  * expression stays inside whole-stage codegen and the plan remains
  * columnar-scan -> project with no extra exchange.
  *
  * The fold in `aggregate` is a sequential left fold, so the floating
  * point summation order is deterministic — important for oracle
  * comparison and reproducible top-k ranking.
  */
object Similarity {

  /** Cast array<float> (parquet `list<float>`) to array<double> so all
    * arithmetic runs in double precision. */
  def toDoubleArray(a: Column): Column = a.cast("array<double>")

  /** Codegen'd dot product (see [[DotProduct]]); same sequential-fold
    * float semantics as the higher-order formulation it replaces. */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(DotProduct(
      Bridge.expression(a.cast("array<double>")),
      Bridge.expression(b.cast("array<double>"))))
  }

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity between two embedding columns (any numeric array
    * type; computed in double). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Unit-normalized embedding (codegen, see [[UnitVector]]): normalize
    * once per row so pairwise cosine is a single [[dot]] — the standard
    * pre-normalization every ANN / near-dup pipeline does at ingest. */
  def unit(a: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(UnitVector(Bridge.expression(a.cast("array<double>"))))
  }
}
