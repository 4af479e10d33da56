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
  def toDoubleArray(a: Column): Column = transform(a, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  /** Cosine similarity between two embedding columns (any numeric array
    * type; computed in double). */
  def cosine(a: Column, b: Column): Column = {
    val ad = toDoubleArray(a)
    val bd = toDoubleArray(b)
    dot(ad, bd) / (norm(ad) * norm(bd))
  }
}
