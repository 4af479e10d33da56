package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting by degree orientation — the third graph-analytics
  * shape next to [[ConnectedComponents]] (closure) and [[PageRank]]
  * (iteration): a single non-iterative join dataflow whose intermediate
  * size is BOUNDED by construction, not by luck of the data.
  *
  * The classic hazard is wedge explosion: enumerating open wedges from
  * each node costs Σ deg(v)², which a single celebrity hub turns into
  * a job-killing cross product. The fix (Schank & Wagner's
  * forward/compact-forward; Suri & Vassilvitskii's MR partition
  * variant, WWW'11) is to ORIENT every undirected edge from its
  * (degree, id)-smaller endpoint to the larger: each triangle then has
  * exactly one "pivot" node with both out-edges, wedges are generated
  * from out-edges only, and every node's out-degree is ≤ O(√m) — so
  * wedge volume is Σ outdeg(v)² ≤ O(m^1.5) regardless of hub skew.
  *
  * 100 TB plan shape: degree computation is one exchange on node id
  * with map-side combine (hub edges partially count before shuffling);
  * orientation is two joins against the node-sized degree table
  * (broadcast when it fits, else co-partitioned); wedge generation is
  * one self-join of the oriented edges on the pivot (an equi-join on
  * `src` — co-located if the oriented edges are bucketed by src); the
  * closing-edge check is one more equi-join on the (lo, hi) pair. No
  * iteration, no driver state, no collect.
  */
object Triangles {

  /** `edges`: two BIGINT columns `src`, `dst`, undirected (either or
    * both directions, duplicates and self-loops tolerated — the graph
    * is canonicalized first). Returns one row per node that closes at
    * least one triangle: (node_id, n_triangles). */
  def perNode(edges: DataFrame): DataFrame = {
    val tri = triangles(edges)
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("node_id"))
      .groupBy("node_id").agg(count(lit(1)).as("n_triangles"))
  }

  /** The distinct triangle set as canonical rows (a < b < c by node
    * id). Exposed so callers can aggregate their own way (per-node,
    * global, clustering coefficient). */
  def triangles(edges: DataFrame): DataFrame = {
    // canonical simple graph: lo < hi, self-loops dropped, multi-edges
    // collapsed — the distinct is the only full-edge-set exchange
    val und = edges
      .select(least(col("src"), col("dst")).as("lo"),
        greatest(col("src"), col("dst")).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct()
    val deg = und.select(col("lo").as("id"))
      .unionByName(und.select(col("hi").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    // orient lo→hi or hi→lo by the (deg, id) total order; keep the
    // destination's order key so wedge endpoints can be ordered too
    val dl = deg.select(col("id").as("lo"), col("deg").as("dlo"))
    val dh = deg.select(col("id").as("hi"), col("deg").as("dhi"))
    val oriented = und.join(dl, "lo").join(dh, "hi")
      .select(
        when(col("dlo") < col("dhi") ||
          (col("dlo") === col("dhi") && col("lo") < col("hi")),
          struct(col("lo").as("u"), col("hi").as("v"),
            col("dhi").as("dv")))
          .otherwise(struct(col("hi").as("u"), col("lo").as("v"),
            col("dlo").as("dv"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"), col("e.dv").as("dv"))
    // wedges from each pivot's out-edges, endpoints ordered by the same
    // (deg, id) key — the closing edge, if present, is oriented b→c
    val e1 = oriented.select(col("u").as("p"), col("v").as("b"),
      col("dv").as("db"))
    val e2 = oriented.select(col("u").as("p"), col("v").as("c"),
      col("dv").as("dc"))
    val wedges = e1.join(e2, "p")
      .filter(col("db") < col("dc") ||
        (col("db") === col("dc") && col("b") < col("c")))
      .select(col("p"), col("b"), col("c"))
    val closing = oriented.select(col("u").as("b"), col("v").as("c"))
    wedges.join(closing, Seq("b", "c"))
      .select(least(col("p"), col("b"), col("c")).as("a"),
        (col("p") + col("b") + col("c")
          - least(col("p"), col("b"), col("c"))
          - greatest(col("p"), col("b"), col("c"))).as("b"),
        greatest(col("p"), col("b"), col("c")).as("c"))
  }
}
