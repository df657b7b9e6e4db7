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

  /** Per-community modularity contributions of a partition over an
    * undirected graph — Newman–Girvan Q (Phys. Rev. E 69, 2004), the
    * standard "is this clustering better than chance" audit for the
    * [[labelPropagation]] output (or any (id, community) table: LPA is a
    * local rule and can shred or over-merge; Q is the global score that
    * says whether the partition found real structure).
    *
    * Exact integer arithmetic: Q = Σ_c [e_c/m − (D_c/(2m))²] over
    * communities c, where m = |E| (distinct undirected edges, self-loops
    * dropped), e_c = within-community edges, D_c = Σ degrees. Each
    * community's contribution is published as sign-split ppm of the
    * common-denominator form (4m·e_c − D_c²)·10⁶ div 4m² — decimal(38,0)
    * intermediates, so the per-community rows sum exactly to Q_ppm and the
    * whole computation replays bit-identically in SQL (a float Q would
    * drift in the last ulp on summation order alone).
    *
    * '''Plan shape (100 TB).''' One distinct over the edge list (shared by
    * the edge count, the degree aggregate, and the within-edge probe via a
    * single checkpoint), then node-grain shuffle equi-joins against the
    * assignment for both endpoints (the assignment is corpus-sized — never
    * broadcast; a hub node is a hot join key, skewJoin-compatible) and a
    * community-grain epilogue. Only the 1-row edge-count frame rides a
    * broadcast; nothing is collected to the driver. */
  def modularity(edges: DataFrame, aCol: String, bCol: String,
      communities: DataFrame): DataFrame = {
    val canon = edges
      .filter(col(aCol) =!= col(bCol))
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .distinct()
      .localCheckpoint() // feeds the m count, degrees, AND within-edge probe
    val cm = communities.select(col("id"), col("community"))
    val mTbl = canon.agg(count(lit(1)).as("__m"))
    val deg = canon.select(col("a").as("id"))
      .unionAll(canon.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("__d"))
    val degByComm = deg.join(cm, Seq("id"))
      .groupBy("community")
      .agg(sum(col("__d").cast("decimal(38,0)")).as("deg_sum"),
        count(lit(1)).as("n_nodes"))
    val within = canon
      .join(cm.select(col("id").as("a"), col("community").as("__ca")), Seq("a"))
      .join(cm.select(col("id").as("b"), col("community").as("__cb")), Seq("b"))
      .filter(col("__ca") === col("__cb"))
      .groupBy(col("__ca").as("community"))
      .agg(count(lit(1)).as("e_in"))
    degByComm
      .join(within, Seq("community"), "left")
      .na.fill(0L, Seq("e_in"))
      .crossJoin(broadcast(mTbl))
      .withColumn("__num",
        (lit(4).cast("decimal(38,0)") * col("__m") * col("e_in") -
          col("deg_sum") * col("deg_sum")).cast("decimal(38,0)"))
      .withColumn("q_ppm",
        (when(col("__num") < 0, -1L).otherwise(1L) *
          expr("(abs(__num) * 1000000) div (4 * cast(__m as decimal(38,0)) * __m)"))
          .cast("long"))
      .select(col("community"), col("n_nodes"),
        col("deg_sum").cast("long").as("deg_sum"), col("e_in"), col("q_ppm"))
  }
}
