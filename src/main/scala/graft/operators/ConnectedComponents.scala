package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list, labelling every
  * vertex with the MINIMUM vertex id reachable from it — the duplicate-
  * cluster operator of the dedup pipeline (cluster id = canonical
  * representative to keep).
  *
  * Two execution paths, chosen adaptively like AQE picks join
  * strategies at runtime:
  *
  *  - **small graphs** (pair count under `localThreshold`): collect the
  *    edge list and run union-find (path-halving, union-by-min) on the
  *    driver — one collect instead of a multi-round join loop. LSH
  *    candidate pairs are near-dup-rate-sized, not corpus-sized, so
  *    this is the common case even at large corpus scale.
  *  - **large graphs**: distributed min-label propagation with pointer
  *    jumping — per round one join against the edge list, one
  *    min-groupBy, and one label-of-label join, early exit when no
  *    label changes. Rounds = O(log diameter), so even pathological
  *    chain-shaped components (transitive near-dup chains) converge
  *    within the iteration budget; exhaustion throws rather than
  *    returning partial labels.
  *
  * Both paths produce identical output (min-reachable label), pinned by
  * ConnectedComponentsSpec property tests.
  */
object ConnectedComponents {

  /** @param pairs DataFrame with two long columns (src, dst), one row
    *              per undirected edge (orientation irrelevant)
    * @return (doc_id, cluster) — one row per vertex appearing in pairs
    */
  def components(spark: SparkSession, pairs: DataFrame,
                 srcCol: String, dstCol: String,
                 localThreshold: Long = 1000000L): DataFrame = {
    val p = pairs.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).persist()
    val n = p.count()
    val out =
      if (n <= localThreshold) {
        val labels = unionFindLocal(p.collect()
          .map(r => (r.getLong(0), r.getLong(1))))
        import spark.implicits._
        labels.toSeq.toDF("doc_id", "cluster")
      } else labelPropagate(p)
    p.unpersist()
    out
  }

  /** INCREMENTAL update of a persisted cluster-label table: union a
    * new batch's edges into stored `(doc_id, cluster)` labels without
    * re-deriving components for the whole corpus — the recurring
    * 100 TB dedup job's shape, where the label table is an INDEX
    * maintained next to the signature index ([[graft.operators.Dedup
    * .incrementalDedup]] probes signatures; this maintains clusters).
    *
    * Only components actually TOUCHED by a new edge are re-derived:
    *
    *  1. endpoints of `newEdges` -> their stored cluster ids (semi
    *     join; the affected-cluster set is collision-rate-sized, so it
    *     broadcasts),
    *  2. affected label rows become STAR EDGES `(doc_id, cluster)` —
    *     each stored component collapses to a star, which preserves
    *     its connectivity exactly,
    *  3. [[components]] runs over `newEdges` + stars only,
    *  4. untouched label rows pass through unchanged (broadcast
    *     anti-join on cluster id — map-side pruning, no shuffle of the
    *     stored table).
    *
    * Label stability: labels are min-reachable ids, so a component
    * untouched by new edges keeps its id bit-for-bit, and two old
    * clusters bridged by a new doc adopt min(old ids) — the result
    * equals a from-scratch [[components]] over the union of all edges
    * (pinned by ConnectedComponentsSpec).
    *
    * @param stored   persisted labels `(doc_id, cluster)` — the output
    *                 of a previous [[components]]/[[incremental]] run
    * @param newEdges new undirected edges `(srcCol, dstCol)`; may
    *                 reference both new and already-indexed docs
    * @return the full updated label table `(doc_id, cluster)` */
  def incremental(spark: SparkSession, stored: DataFrame, newEdges: DataFrame,
                  srcCol: String = "doc_a", dstCol: String = "doc_b"): DataFrame = {
    // Both multiply-referenced inputs are pinned once (localCheckpoint
    // via the Checkpoints registry): `newEdges` feeds the touched-set
    // AND the re-derivation union, and `affectedClusters` feeds the
    // affected-rows join AND the final anti-join — without pinning,
    // each reference re-evaluates the caller's edge-derivation lineage
    // (at 100 TB: a full signature-probe pass per reference; in the
    // gate: the whole minhash->LSH chain). Both frames are
    // collision-rate-sized — batch edges and touched cluster ids — not
    // corpus-sized, so pinning is cheap. `stored` is deliberately NOT
    // pinned: it is corpus-sized and in production is a persisted
    // label-table read, which the block manager must not duplicate.
    // LAZY pins (round 17 — the Bfs round-16 rationale): the eager
    // pin+dispatch pair cost one driver job each before any real work;
    // lazily the whole maintenance flow executes at the consumer's
    // action, each frame cached at first materialization so the double
    // references still read the cache (d18 receipt: 26 -> 22 jobs per
    // call, warm wall flat at ~3.4 s — the gate's cost is the minhash/
    // LSH chains themselves, not dispatch; kept because laziness is
    // free and scale-right).
    val edges = Checkpoints.pinLazy(
      newEdges.select(col(srcCol).cast("long").as(srcCol),
        col(dstCol).cast("long").as(dstCol)))
    val touched = edges.select(col(srcCol).as("doc_id"))
      .union(edges.select(col(dstCol).as("doc_id"))).distinct()
    val affectedClusters = Checkpoints.pinLazy(
      stored.join(touched, Seq("doc_id")).select("cluster").distinct())
    val affected = stored.join(broadcast(affectedClusters), Seq("cluster"))
    val stars = affected.select(col("doc_id").cast("long").as(srcCol),
      col("cluster").cast("long").as(dstCol))
    val rederived = components(spark, edges.unionByName(stars), srcCol, dstCol)
    stored.join(broadcast(affectedClusters), Seq("cluster"), "left_anti")
      .select(col("doc_id").cast("long"), col("cluster").cast("long"))
      .unionByName(rederived)
  }

  /** Driver-side union-find (path halving, union by min root), so the
    * root of every tree is the minimum id of its component. */
  def unionFindLocal(edges: Array[(Long, Long)]): Array[(Long, Long)] = {
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x0: Long): Long = {
      var x = x0
      while (parent.getOrElse(x, x) != x) {
        val gp = parent.getOrElse(parent(x), parent(x))
        parent(x) = gp // path halving
        x = gp
      }
      x
    }
    edges.foreach { case (a, b) =>
      val ra = find(a); val rb = find(b)
      if (ra != rb) {
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
    val verts = edges.iterator.flatMap(e => Iterator(e._1, e._2)).toArray.distinct
    verts.sorted.map(v => (v, find(v)))
  }

  /** Distributed min-label propagation to fixpoint, with POINTER
    * JUMPING each round (label := min(label, label-of-label)): distances
    * to the component minimum halve per round on top of the edge hop,
    * so convergence is O(log diameter) rounds — a 2^50-diameter path
    * would be needed to exhaust the default iteration budget. Labels
    * only decrease and only to reachable vertex ids, so the fixpoint is
    * the min-reachable label (same contract as the union-find path).
    *
    * Throws IllegalStateException if the budget is exhausted before the
    * fixpoint — silently returning partial labels would corrupt every
    * downstream dedup decision. */
  def labelPropagate(p: DataFrame, maxIters: Int = 50): DataFrame = {
    val edges = p.union(p.select(col("dst").as("src"), col("src").as("dst"))).persist()
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("cluster", col("doc_id")).persist()
    var changed = 1L
    var iters = 0
    while (changed > 0 && iters < maxIters) {
      val prop = labels.join(edges, col("doc_id") === col("src"))
        .select(col("dst").as("doc_id"), col("cluster"))
      val minLabels = labels.select("doc_id", "cluster").union(prop)
        .groupBy("doc_id").agg(min(col("cluster")).as("cluster"))
      // pointer jump: my label's own label is also reachable from me.
      // localCheckpoint truncates the lineage, which otherwise DOUBLES
      // per round (minLabels appears twice in the jump join) — plan
      // growth, not data, is what kills long iterative loops. Pinned
      // via Checkpoints: Dataset.unpersist would be a silent no-op on
      // a checkpoint RDD, so release goes through clearCaches.
      val next = Checkpoints.pin(minLabels
        .join(minLabels.select(col("doc_id").as("__c"), col("cluster").as("__cc")),
          col("cluster") === col("__c"), "left")
        .select(col("doc_id"),
          least(col("cluster"), coalesce(col("__cc"), col("cluster"))).as("cluster")))
      changed = next.join(labels.withColumnRenamed("cluster", "old"), "doc_id")
        .filter(col("cluster") =!= col("old")).count()
      labels.unpersist()
      labels = next
      iters += 1
    }
    edges.unpersist()
    if (changed > 0) {
      labels.unpersist()
      throw new IllegalStateException(
        s"connected components did not converge in $maxIters rounds — " +
          "refusing to return partial cluster labels")
    }
    labels
  }
}
