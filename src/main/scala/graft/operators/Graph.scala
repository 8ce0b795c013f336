package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Iterative graph-propagation operators over edge-list DataFrames —
  * the link-analysis signals web-scale corpus curation uses (host-level
  * trust/authority propagation a la PageRank; TextRank keyword scoring
  * is the same fixpoint over a token co-occurrence graph).
  *
  * The reference engine has no graph operator; this family extends the
  * engine the same way the dedup-cluster fixpoint
  * ([[Dedup.duplicateClusters]]) does: a deterministic, bounded-round
  * iteration expressed as vanilla joins + aggregations so Catalyst/AQE
  * plan each round.
  */
object Graph {

  /** Weighted PageRank (Page et al. 1999) over a directed edge list,
    * run for a FIXED number of rounds (fixed rounds, not a convergence
    * probe: the per-round delta is data-dependent and would make the
    * output nondeterministic across engines). Power-iteration error
    * contracts by the damping factor per round — ≤ 0.85¹⁰ ≈ 0.2 of the
    * initial gap after the default 10, with bipartite structure (doc ↔
    * host graphs) oscillating at exactly that envelope — so pick
    * `iterations` for the accuracy the downstream policy needs; the
    * 1e-`grid` rounding floor is the precision ceiling.
    *
    * pr_0(v)   = 1/N
    * pr_r(v)   = (1-d)/N + d * Σ_{u→v} pr_{r-1}(u) * w(u,v) / W(u)
    *
    * where W(u) is u's total outgoing weight. Nodes are the edge-list
    * endpoints, so every node has W(u) > 0 when the caller symmetrizes
    * the graph (undirected co-occurrence edges emitted both ways);
    * genuinely dangling sinks (directed graphs) keep their base share
    * and their inbound mass — the "no dangling redistribution" variant,
    * chosen because redistribution needs an extra global sum per round
    * (one more action) for a constant the caller can fold in afterward.
    *
    * Determinism: every per-edge contribution is rounded to the 1e-`grid`
    * grid and summed in decimal(38, `grid`) — exact in any partition
    * order, in any engine — and the per-node combine is plain IEEE
    * double arithmetic on grid-aligned values, so two runs (or two
    * engines mirroring the expression) agree bit for bit. Same recipe as
    * the PCA moments ([[Pca.covariance]]) and RRF sums
    * ([[Retrieval.rrfFuse]]).
    *
    * Scale: per round — one shuffle-hash join of the (checkpointed once)
    * weighted edge list with the node-sized rank table on `src`, one
    * hash aggregate on `dst` with map-side decimal partials, one left
    * join back to the node set. Rank tables are localCheckpointed each
    * round so lineage stays O(1) across rounds instead of O(rounds)
    * (same discipline as [[Dedup.duplicateClusters]]' label
    * propagation). Nothing is ever collected to the driver; N comes
    * from one count action.
    *
    * Output: (node, pr) — pr on the 1e-`grid` grid, Σ pr ≈ 1.
    */
  def pageRank(
      edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: Option[String] = None, iterations: Int = 10,
      damping: Double = 0.85, grid: Int = 12): DataFrame = {
    require(iterations >= 1 && iterations <= 100,
      s"iterations must be in [1, 100] (got $iterations)")
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0, 1) (got $damping)")
    require(grid >= 6 && grid <= 18, s"grid must be in [6, 18] (got $grid)")
    val w = weightCol.map(c => col(c).cast("long")).getOrElse(lit(1L))
    // Parallel edges collapse to one summed-weight edge up front (exact
    // long sums) so the per-round join moves one row per distinct edge.
    val e0 = edges.select(
        col(srcCol).cast("string").as("src"),
        col(dstCol).cast("string").as("dst"), w.as("w"))
      .groupBy("src", "dst").agg(sum("w").as("w"))
    val outW = e0.groupBy("src").agg(sum("w").as("outw"))
    // Checkpointed once: the edge list is re-joined every round, and
    // without the checkpoint each round would re-run the collapse + outW
    // aggregation subtree.
    val e = e0.join(outW, "src").localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint()
    val n = nodes.count()
    val base = (1.0 - damping) / n
    val dec = DecimalType(38, grid)
    var pr = nodes.withColumn("pr", lit(1.0 / n))
    for (_ <- 1 to iterations) {
      val sums = e.join(pr, col("src") === col("node"))
        .select(col("dst"),
          round(col("pr") * col("w") / col("outw"), grid).cast(dec).as("c"))
        .groupBy("dst").agg(sum("c").as("s"))
      pr = nodes.join(sums, col("node") === col("dst"), "left")
        .select(col("node"),
          round(lit(base) + lit(damping) *
            coalesce(col("s").cast("double"), lit(0.0)), grid).as("pr"))
        .localCheckpoint()
    }
    pr
  }
}
