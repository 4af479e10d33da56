package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-hop breadth-first search: minimum hop distance from a set
  * of source nodes to every node reachable within `maxHops` — the
  * reachability/radius primitive (fraud rings, entity-linkage blast
  * radius, "who trades within N steps of X").
  *
  * Frontier formulation, not Bellman-Ford over all nodes: round h
  * expands ONLY the nodes first discovered in round h-1 (an anti-join
  * against the seen set), so per-round work tracks the frontier size,
  * and with unit weights first discovery IS the minimal distance — no
  * relaxation ever revisits a node. Each round is one join + distinct;
  * lineage is cut per round (the d7 pointer-jumping discipline:
  * iterative loops grow the PLAN, not the data) and an empty frontier
  * exits early, so `maxHops` is a budget, not a fixed cost.
  *
  * At 100 TB the seen set is the memory bound: it grows toward the
  * reachable component. For ego-net radii (the common case) that is
  * small; for whole-graph sweeps prefer the label-propagation shape
  * (ConnectedComponents) whose state is one label per node.
  */
object Bfs {

  /** `edges`: (src, dst) directed — pass both directions for an
    * undirected graph. `sources`: (id). Returns (id, dist), dist 0 at
    * the sources, minimum hops elsewhere, nodes beyond `maxHops`
    * absent. */
  def hopDistances(edges: DataFrame, sources: DataFrame,
                   maxHops: Int): DataFrame = {
    require(maxHops >= 0)
    // pin the edge list once: it is scanned every hop, and an un-pinned
    // edge DataFrame re-evaluates the caller's derivation lineage per
    // round (the weightedDistances round-10 fix, same cause). A caller
    // that already persisted its edges (the memoized trade graph)
    // keeps its copy — a second checkpoint would double the storage.
    val e = if (maxHops > 1 &&
        edges.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      Checkpoints.pin(edges.select(col("src"), col("dst")))
      else edges.select(col("src"), col("dst"))
    var dist = Checkpoints.pin(
      sources.select(col("id")).distinct()
        .select(col("id"), lit(0L).as("dist")))
    var frontier = dist
    var h = 1
    var live = true
    while (h <= maxHops && live) {
      val next = Checkpoints.pin(
        frontier.join(e, frontier("id") === e("src"))
          .select(col("dst").as("id"))
          .distinct()
          .join(dist.select(col("id").as("__seen")),
            col("id") === col("__seen"), "left_anti")
          .select(col("id"), lit(h.toLong).as("dist")))
      if (next.isEmpty) live = false
      else {
        dist = Checkpoints.pin(dist.union(next))
        frontier = next
      }
      h += 1
    }
    dist
  }

  /** Weighted single-source(s) shortest paths: distributed
    * Bellman-Ford with FIXED relaxation rounds — after round k, `dist`
    * is the exact minimum-cost path using at most k edges (so `rounds`
    * bounds path LENGTH the way [[hopDistances]]' maxHops bounds
    * hops; rounds >= diameter gives true shortest paths). The case
    * BFS gets wrong — a longer path that is cheaper — needs weights,
    * and weights break the frontier trick (a settled node can improve
    * later), so every round relaxes the whole dist table:
    * one join + one min-aggregation, both partial-aggregating on the
    * node key. Exact int64 weight sums (caller keeps
    * `rounds * max_w` inside int64); negative weights are accepted by
    * the arithmetic but `rounds` then bounds walk length, not path
    * length (no negative-cycle detection here).
    *
    * Fixed-round discipline (g17/g41): deterministic plan, oracle
    * unrolls the identical rounds; lineage cut per round via
    * [[Checkpoints.pin]]. State is one (id, dist) row per REACHED
    * node — the same memory bound as [[hopDistances]]' seen set.
    *
    * `edges`: (src, dst, w) directed — pass both directions for an
    * undirected graph. `sources`: (id), distance 0. Unreached nodes
    * are absent. */
  def weightedDistances(edges: DataFrame, sources: DataFrame,
                        rounds: Int): DataFrame = {
    require(rounds >= 0)
    // the edge list is scanned once PER ROUND: pin it, or every round
    // re-evaluates the caller's whole edge-derivation lineage (g53's
    // orders-lineitem join ran 4x before round 10 — most of its wall).
    // Already-persisted edges keep the caller's copy (no double pin).
    val e = if (rounds > 1 &&
        edges.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      Checkpoints.pin(edges.select(col("src"), col("dst"), col("w")))
      else edges.select(col("src"), col("dst"), col("w"))
    var dist = Checkpoints.pin(
      sources.select(col("id")).distinct()
        .select(col("id"), lit(0L).as("dist")))
    for (_ <- 1 to rounds) {
      val relaxed = dist.join(e, dist("id") === e("src"))
        .select(col("dst").as("id"), (col("dist") + col("w")).as("dist"))
      dist = Checkpoints.pin(
        dist.union(relaxed).groupBy("id").agg(min("dist").as("dist")))
    }
    dist
  }
}
