package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Community detection by synchronous label propagation (LPA — Raghavan,
  * Albert & Kumara, "Near linear time algorithm to detect community
  * structures in large-scale networks", Phys. Rev. E 76, 2007): every node
  * starts in its own community; each round, every node adopts the label
  * held by the MOST of its neighbors (ties to the smallest label). Where
  * [[ConnectedComponents]] answers "what is reachable" (one label per
  * component), LPA splits dense regions inside a component — the usual
  * next question over a near-duplicate or co-occurrence graph.
  *
  * Determinism: the textbook algorithm breaks ties randomly and updates
  * asynchronously; this one is SYNCHRONOUS with a total tie order
  * (count desc, then label asc) and a FIXED iteration count, so the result
  * is a pure function of the edge list — bit-identical across engines
  * (the oracle unrolls the same rounds as CTEs), at the known cost that
  * bipartite-ish regions can oscillate rather than converge.
  *
  * '''Plan shape (the 100-TB design).''' Per round: one equi-join of the
  * adjacency list against the current (node → label) table — both keyed by
  * node id, skewJoin-compatible — and two map-side-combined aggregates
  * (label counts, then the per-node argmax as a `min(struct)` — no window
  * over a hub's neighbor list). The adjacency list is localCheckpointed
  * once and each round's label table is checkpointed to truncate lineage
  * (the [[ConnectedComponents]]/[[PageRank]] iteration rule). A hub node
  * means a hot JOIN key, not a hot reducer: the argmax aggregates at
  * (node, label) grain first.
  */
object Communities {

  /** (id, community) after `iters` synchronous LPA rounds over the
    * undirected graph (any orientation; duplicates and self-loops
    * tolerated). Labels are node ids; `community` is the label adopted
    * after the final round. */
  def labelPropagation(edges: DataFrame, aCol: String, bCol: String,
      iters: Int = 3): DataFrame = {
    require(iters >= 1, s"iters must be positive, got $iters")
    val canon = edges
      .filter(col(aCol) =!= col(bCol))
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .distinct()
    val adj = canon.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(canon.select(col("b").as("src"), col("a").as("dst")))
      .localCheckpoint()
    var labels = adj.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("lbl"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val neighborLabels = adj
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .select(col("src"), col("lbl"))
      val counts = neighborLabels.groupBy("src", "lbl")
        .agg(count(lit(1)).as("__c"))
      // argmax with (count desc, label asc) ties as one aggregate: labels
      // are non-negative node ids, so negating the count (not the label)
      // keeps the struct comparison safe at any id magnitude
      labels = counts.groupBy("src")
        .agg(min(struct((col("__c") * -1).as("nc"), col("lbl").as("lbl"))).as("m"))
        .select(col("src").as("id"), col("m").getField("lbl").as("lbl"))
        .localCheckpoint()
    }
    labels.select(col("id"), col("lbl").as("community"))
  }
}
