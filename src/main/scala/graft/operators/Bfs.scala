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
    var dist = Checkpoints.pin(
      sources.select(col("id")).distinct()
        .select(col("id"), lit(0L).as("dist")))
    var frontier = dist
    var h = 1
    var live = true
    while (h <= maxHops && live) {
      val next = Checkpoints.pin(
        frontier.join(edges, frontier("id") === edges("src"))
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
}
