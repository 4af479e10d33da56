package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank as a fixed-iteration relational dataflow — the iterative
  * graph-analytics shape ([[ConnectedComponents]] covers the other one)
  * expressed as unrolled join+aggregate rounds so Catalyst sees ONE
  * declarative plan per run: no driver-side mutation, no RDD loop
  * state, every iteration a (join → groupBy → left-join) stanza over
  * the same edge relation.
  *
  * EXACT INTEGER arithmetic for engine-portable determinism: ranks are
  * BIGINT micro-units (1.0 == 1,000,000), each edge carries
  * `floor(rank / outdeg)` and the damping step is
  * `150_000 + (85 * inbound) div 100` — floor division both times, so
  * any engine (and any summation order) produces bit-identical ranks.
  * Doubles would differ in ulps across engines/partitionings; integers
  * cannot.
  *
  * 100 TB: each iteration is one shuffle on `dst` (the contribution
  * aggregation) plus one shuffle-free broadcast-or-colocated join back
  * to the node list; the edge relation is iteration-invariant, so a
  * production run persists/buckets it by `src` once and every round's
  * `edges ⋈ ranks` is co-located. Rank skew (celebrity nodes) is
  * absorbed by the partial aggregation: contributions combine map-side
  * before the `dst` exchange. Fixed iteration count keeps the plan
  * finite; convergence-driven loops belong in the driver with a
  * per-round action, which is exactly what this shape avoids for small
  * fixed budgets (3-10 rounds is the common production setting).
  */
object PageRank {

  /** `edges`: two BIGINT columns `src`, `dst` (pre-deduplicated;
    * multi-edges count multiple times, callers wanting simple graphs
    * distinct() first). Returns (node_id, rank_micros) after
    * `iterations` damped rounds from a uniform 1.0 start. */
  def ranks(edges: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val nodes = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // edge list annotated with its source's out-degree, PINNED: it is
    // iteration-invariant and referenced every round — unpinned, each
    // round re-derives the degree aggregation + join (ReusedExchange
    // recovers some but not the join), measured at sf0.1 as ~2.5 s of
    // a 7 s warm wall. The node list is pinned for the same reason
    // (one union+distinct exchange instead of iterations+1).
    val withDeg = Checkpoints.pin(edges.join(deg, "src"))
    val nodesP = Checkpoints.pin(nodes)
    var ranks = nodesP.select(col("id"), lit(1000000L).as("rank_micros"))
    for (_ <- 1 to iterations) {
      val inbound = withDeg
        .join(ranks, withDeg("src") === ranks("id"))
        .select(col("dst"), expr("rank_micros div outdeg").as("contrib"))
        .groupBy("dst").agg(sum("contrib").as("inbound"))
      ranks = nodesP
        .join(inbound, nodesP("id") === inbound("dst"), "left")
        .select(col("id"),
          (lit(150000L) + expr("(85 * coalesce(inbound, 0L)) div 100"))
            .as("rank_micros"))
    }
    ranks
  }

  /** PERSONALIZED PageRank (Haveliwala 2002, "Topic-sensitive
    * PageRank"): teleport mass lands only on `seeds`, so rank measures
    * proximity to the seed set instead of global centrality — the
    * graph-side data-selection primitive (expand a trusted seed corpus
    * along link structure; cf. Harmonic/TrustRank-style curation) next
    * to [[ranks]]'s global summary. Same unrolled
    * join-aggregate-stanza shape, same EXACT INTEGER micro-unit
    * arithmetic (per-seed 1e6 basis, floor division at both steps —
    * engine- and summation-order-portable): start = 1e6 on seeds / 0
    * elsewhere, damping base = 150000 on seeds / 0 elsewhere. Nodes
    * outside the seeds' `iterations`-hop neighborhood hold rank 0 —
    * at 100 TB the per-round frontier is bounded by the seed
    * neighborhood, not the graph, and the same persist-edges-by-src
    * co-location argument applies.
    *
    * `seeds`: one BIGINT column `id`; ids absent from the edge list
    * are ignored (they have no neighborhood to rank). */
  def personalizedRanks(edges: DataFrame, seeds: DataFrame,
                        iterations: Int): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val nodes = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // the iteration-INVARIANT frames, pinned once (the scaladoc's
    // "a production run persists/buckets the edge relation" made
    // real): unpinned, every round re-derives the degree join and the
    // node-list distinct — 5 redundant exchanges per extra round
    val withDeg = Checkpoints.pin(edges.join(deg, "src"))
    val seeded = Checkpoints.pin(nodes.join(
      seeds.select(col("id")).distinct().withColumn("__seed", lit(1L)),
      Seq("id"), "left"))
    var ranks = seeded.select(col("id"),
      (coalesce(col("__seed"), lit(0L)) * 1000000L).as("rank_micros"))
    for (_ <- 1 to iterations) {
      // the frontier bound, IN the plan: zero-rank nodes contribute
      // exactly 0 (0 div outdeg), so filtering them before the edge
      // join is semantics-preserving — and it is what makes each
      // round's join carry the seed NEIGHBORHOOD instead of the whole
      // graph (round 1 joins |seeds| rows, not |V|; measured at
      // sf0.1: g61 warm 6.7-9.9 s -> ~4 s)
      val inbound = withDeg
        .join(ranks.filter(col("rank_micros") > 0L),
          withDeg("src") === ranks("id"))
        .select(col("dst"), expr("rank_micros div outdeg").as("contrib"))
        .groupBy("dst").agg(sum("contrib").as("inbound"))
      ranks = seeded
        .join(inbound, seeded("id") === inbound("dst"), "left")
        .select(col("id"),
          (coalesce(col("__seed"), lit(0L)) * lit(150000L) +
            expr("(85 * coalesce(inbound, 0L)) div 100"))
            .as("rank_micros"))
    }
    ranks
  }
}
