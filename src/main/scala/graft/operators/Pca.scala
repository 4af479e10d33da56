package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Similarity

/** Principal component analysis over an embedding column, shaped for
  * corpora that do not fit anywhere: the data-sized work is ONE
  * projection + one d^2/2-group aggregation (the covariance pass);
  * everything eigen happens on the driver over the d x d matrix,
  * which is tiny for any practical embedding width. The corpus is
  * never collected, never self-joined, never iterated over — power
  * iteration touches only the aggregated matrix.
  *
  * Determinism: fixed all-ones start vector, fixed iteration count,
  * sign normalized (the coordinate with the largest magnitude is made
  * positive), so retries and engines agree bit-for-bit given the same
  * covariance entries.
  */
object Pca {

  /** Centered covariance entries cov(i, j) for 0 <= i <= j < d over
    * the first d dims of `embCol`. ONE [[graft.functions.GramianAgg]]
    * aggregation pass — each row adds its d(d+1)/2 upper-triangle
    * products into a flat per-partition buffer, partials merge
    * elementwise, and the exchange carries one buffer per partition
    * (~8*d^2/2 bytes) instead of d^2/2 exploded struct ROWS per input
    * row (the round-8 form: fine at d=8, a ~300,000x scan
    * amplification at d=768). The d(d+1)/2 output rows then unpack
    * from the SINGLE aggregated array — the explode here touches one
    * row, not the corpus. Centering cov = P/n - (S_i/n)(S_j/n) runs
    * the same final float ops as the exploded form's
    * `avg(p) - avg(e_i)*avg(e_j)`, preserving oracle parity. */
  def covariance(em: DataFrame, embCol: String, d: Int): DataFrame = {
    val e = em.select(Similarity.toDoubleArray(col(embCol)).as("e"))
    val g = e.agg(graft.functions.Gramian.gramian(col("e"), d).as("g"))
      // zero qualifying rows -> EMPTY result (the exploded form's
      // behavior), never d^2/2 rows of 0/0 = NaN
      .where(expr("g[0] > 0"))
    g.select(explode(expr(
        s"""flatten(transform(sequence(0, ${d - 1}), i ->
             transform(sequence(i, ${d - 1}), j ->
               named_struct('i', CAST(i AS BIGINT), 'j', CAST(j AS BIGINT),
                 'cov', g[CAST(1 + $d + i * $d - (i * (i - 1)) div 2 + j - i AS INT)]
                          / g[0]
                   - (g[CAST(1 + i AS INT)] / g[0])
                     * (g[CAST(1 + j AS INT)] / g[0])))))""")).as("x"))
      .select(col("x.i").as("i"), col("x.j").as("j"), col("x.cov").as("cov"))
  }

  /** Top principal component (unit eigenvector of the covariance
    * matrix) by `iters` rounds of power iteration on the driver.
    * The only distributed work is [[covariance]]. */
  def topComponent(em: DataFrame, embCol: String, d: Int,
                   iters: Int = 100): Array[Double] =
    topComponents(em, embCol, d, 1, iters).head._2

  /** Top `k` (eigenvalue, unit eigenvector) pairs by power iteration
    * with Hotelling DEFLATION on the driver matrix — after each
    * recovered pair, C <- C - lambda*v*v^T removes that component's
    * variance so the next iteration converges to the next one.
    * The corpus is touched exactly once (the [[covariance]] pass);
    * everything after is d x d driver arithmetic, so k costs nothing
    * distributed. Eigenvalues come from the Rayleigh quotient v^T C v;
    * the same fixed-start/fixed-iterations/sign-normalized
    * determinism as the single-component path. */
  def topComponents(em: DataFrame, embCol: String, d: Int, k: Int,
                    iters: Int = 100): Seq[(Double, Array[Double])] = {
    require(k >= 1 && k <= d, s"k must be in [1, $d]")
    val entries = covariance(em, embCol, d).collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt, r.getDouble(2)))
    val m = Array.ofDim[Double](d, d)
    entries.foreach { case (i, j, c) => m(i)(j) = c; m(j)(i) = c }
    (0 until k).map { _ =>
      var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
      var it = 0
      while (it < iters) {
        val w = Array.tabulate(d)(i =>
          (0 until d).foldLeft(0.0)((acc, j) => acc + m(i)(j) * v(j)))
        val n = math.sqrt(w.map(x => x * x).sum)
        v = if (n == 0.0) v else w.map(_ / n)
        it += 1
      }
      val top = v.indices.maxBy(i => (math.abs(v(i)), -i))
      val vec = if (v(top) < 0) v.map(-_) else v
      val lambda = (0 until d).map(i =>
        vec(i) * (0 until d).map(j => m(i)(j) * vec(j)).sum).sum
      // deflate: remove the recovered component's variance
      for (i <- 0 until d; j <- 0 until d)
        m(i)(j) -= lambda * vec(i) * vec(j)
      (lambda, vec)
    }
  }

  /** Each row's scalar projection onto the top principal component of
    * the first d dims (the 1-D "semantic axis" reduction). The
    * component ships to executors as a plan literal — no join. */
  def project(em: DataFrame, idCol: String, embCol: String, d: Int,
              iters: Int = 100): DataFrame = {
    val pc = topComponent(em, embCol, d, iters)
    val lit0 = array(pc.map(lit): _*)
    em.select(col(idCol),
      Similarity.dot(
        slice(Similarity.toDoubleArray(col(embCol)), 1, d), lit0).as("score"))
  }

  /** Johnson-Lindenstrauss random projection (Achlioptas 2001's
    * database-friendly ±1 variant): k projection components, each the
    * signed sum of the input coordinates under a DETERMINISTIC sign
    * matrix derived arithmetically from (dimension, component) — no
    * stored matrix, no RNG state, any engine regenerates the same
    * projection (the property that makes incremental ingest and
    * cross-engine replay trivial, same design as the LSH plane seeds).
    *
    * Coordinates are quantized to exact integers (`floor(double(x) * 1e6)` —
    * floor on the widened double is pure binary arithmetic, immune to
    * the decimal-vs-binary `round()` halfway drift between engines)
    * BEFORE summation, so each component is an order-independent
    * int64 sum — bit-identical regardless of partitioning, unlike a
    * float dot product. Dot products / distances in the projected
    * space divide back by 1e6 per factor.
    *
    * Plan: k per-row `aggregate(zip_with(...))` expressions — a pure
    * codegen projection, ZERO shuffles, never an explode (the
    * explode+pivot form multiplies the corpus by d×k rows; this
    * touches each row once). Envelope: |x| <= 1e3 and d <= 1e6 keep
    * the signed sum under int64 by six orders of magnitude. */
  def randomProjection(em: DataFrame, idCol: String, embCol: String,
                       k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val comps = (0 until k).map { c =>
      expr(
        s"""aggregate(
              zip_with($embCol, sequence(0, size($embCol) - 1), (x, j) ->
                CASE WHEN ((j * 73856093L + ${c}L * 19349663L) % 83) % 2 = 0
                  THEN CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
                  ELSE -CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
                END),
              CAST(0 AS BIGINT), (acc, v) -> acc + v)""").as(s"proj_$c")
    }
    em.select(col(idCol) +: comps: _*)
  }
}
