package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Whole-graph summary statistics over an edge list. */
object GraphStats {

  /** Global clustering coefficient C = 3·triangles / wedges (wedges =
    * Σ_v d(v)(d(v)−1)/2 over the canonical simple graph) — how much
    * of the graph's two-hop neighborhood closes into triangles, THE
    * transitivity summary next to [[degreeAssortativity]]'s mixing
    * summary. Triangle counting delegates to
    * [[Triangles.triangles]]'s degree-oriented enumeration (never
    * all-pairs); wedges are one degree aggregation. Exact int64
    * counts; c_ppm is one truncating division (both counts
    * non-negative, so `div` and `//` agree). */
  def clusteringCoefficient(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("lo"),
        greatest(col("src"), col("dst")).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct()
    val deg = und.select(col("lo").as("id"))
      .unionByName(und.select(col("hi").as("id")))
      .groupBy("id").agg(count(lit(1)).as("d"))
    val tri = Triangles.triangles(edges)
      .agg(count(lit(1)).as("triangles"))
    deg.agg(count(lit(1)).as("n_nodes"),
        sum(expr("d * (d - 1) div 2")).as("wedges"))
      .crossJoin(und.agg(count(lit(1)).as("n_edges")))
      .crossJoin(tri)
      .select(col("n_nodes"), col("n_edges"), col("triangles"),
        col("wedges"),
        expr("3 * triangles * 1000000 div wedges").as("c_ppm"))
  }

  /** Degree assortativity (Newman 2002, "Assortative mixing in
    * networks"): the Pearson correlation of degrees at the two ends
    * of an edge — positive means hubs link to hubs, negative means
    * hubs link to leaves (a star is exactly −1).
    *
    * PRECONDITION — input must be a SYMMETRIC directed edge list
    * (each undirected edge present in BOTH directions, the repo's
    * trade-graph convention): degrees are derived from the `src`
    * column alone, which equals the undirected degree exactly when
    * every edge has its reverse present. Symmetry also gives Σx = Σy
    * and Σx² = Σy², so the correlation reduces to
    * `r = (m·Σxy − (Σx)²) / (m·Σx² − (Σx)²)` over directed edges.
    * A NON-symmetric list silently drops edges whose dst never
    * appears as src (the inner degree join finds no row) — symmetrize
    * with `e.union(e.select(dst, src))` first; an in-operator
    * symmetry assert would cost an edge-list anti-join per call,
    * which the caller contract makes redundant.
    *
    * One row out: exact int64 m/Σ moments (the oracle replays them
    * bitwise) and r as their ONE double division.
    *
    * Scale: one degree aggregation plus two broadcast-able hash
    * joins of the edge list against the (node-count-sized) degree
    * table, then a scalar aggregate — no pairwise or matrix work.
    * Int64 headroom: m·Σxy is bounded by m²·dmax² (~1e17 at the x10
    * bench graph); a corpus beyond that computes the moments in
    * per-partition exact int64 and combines in double, trading ulps
    * for range — the formula is unchanged. */
  def degreeAssortativity(edges: DataFrame): DataFrame = {
    val deg = edges.groupBy("src").agg(count(lit(1)).as("d"))
    val j = edges
      .join(deg.select(col("src").as("u"), col("d").as("dx")),
        col("src") === col("u"))
      .join(deg.select(col("src").as("v"), col("d").as("dy")),
        col("dst") === col("v"))
    j.agg(count(lit(1)).as("m"),
        sum(col("dx") * col("dy")).as("sxy"),
        sum(col("dx")).as("sx"),
        sum(col("dx") * col("dx")).as("sxx"))
      .select(col("m"), col("sxy"), col("sx"), col("sxx"),
        (col("m") * col("sxy") - col("sx") * col("sx")).as("num"),
        (col("m") * col("sxx") - col("sx") * col("sx")).as("den"))
      .withColumn("r", col("num").cast("double") / col("den"))
  }
}
