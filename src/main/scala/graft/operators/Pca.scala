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
    * the first d dims of `embCol`. One nested-transform projection
    * emits each row's upper-triangle products (no exploded-dim
    * self-join — that shape shuffles the corpus d^2/2 times), one
    * 36-ish-group aggregation, and a broadcast means join; centering
    * (m2 - mi*mj) runs once per GROUP on exact per-group scalars. */
  def covariance(em: DataFrame, embCol: String, d: Int): DataFrame = {
    val e = em.select(Similarity.toDoubleArray(col(embCol)).as("e"))
    val pairs = e.select(explode(expr(
        s"""flatten(transform(sequence(0, ${d - 1}), i ->
             transform(sequence(i, ${d - 1}), j ->
               named_struct('i', i, 'j', j, 'p', e[i] * e[j]))))""")).as("x"))
      .select(col("x.i").cast("long").as("i"),
        col("x.j").cast("long").as("j"), col("x.p").as("p"))
    val m2 = pairs.groupBy("i", "j").agg(avg(col("p")).as("m2"))
    val means = e.select(posexplode(col("e")))
      .filter(col("pos") < d)
      .groupBy(col("pos").cast("long").as("pos")).agg(avg(col("col")).as("m"))
    m2.join(broadcast(means.select(col("pos").as("i"), col("m").as("mi"))), Seq("i"))
      .join(broadcast(means.select(col("pos").as("j"), col("m").as("mj"))), Seq("j"))
      .select(col("i"), col("j"), (col("m2") - col("mi") * col("mj")).as("cov"))
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
}
