package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank with FIXED-POINT INTEGER arithmetic — graph
  * centrality over an edge list (link graphs, near-dup graphs, bipartite
  * user×item graphs), the ranking signal crawl-frontier and corpus-weight
  * pipelines use.
  *
  * Scores are integers scaled by `scale` (default 1e9): the update is
  * `r'(v) = (15·scale) div (100·N) + (85 · Σ_{u→v} (r(u) div outdeg(u))) div 100`
  * — damping 0.85 expressed as integer multiply-then-div, per-neighbor
  * contributions floored BEFORE the sum. Integer sums are associative and
  * commutative, so the result is bit-identical under any partition order
  * and any engine — exactly SQL-replayable with one CTE per iteration
  * (the float formulation would diverge in the last ulp on summation order
  * alone). Mass lost to flooring and to dangling nodes (no out-edges) is
  * NOT redistributed — ranks are comparable within a run, which is what a
  * ranking signal needs; they just don't sum exactly to `scale`.
  *
  * '''Plan shape (the 100-TB design).''' N rides as a broadcast scalar,
  * never a driver-side value. Per iteration: scores and out-degrees join
  * at node grain, contributions shuffle once keyed by destination with a
  * map-side-combined integer sum, and the score frame localCheckpoints so
  * lineage stays flat across iterations (the CC / k-means motif — like
  * those, this is an eager iterative operator, not a lazy plan). A hub
  * node's fan-out skews the src-side join — AQE's runtime skew split
  * handles it, same policy as the substring census. */
object PageRank {

  /** `checkpointDir`: when set, per-iteration score frames persist via
    * RELIABLE `checkpoint` to the cluster store (survives executor loss —
    * what a long ranking job on a real cluster needs) instead of the
    * default executor-local `localCheckpoint`. Identical results; only the
    * persistence contract (and a re-run write pass per iteration) differ. */
  def pageRankInt(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int = 4,
      scale: Long = 1000000000L,
      checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 1, "iters must be at least 1")
    require(scale > 0, "scale must be positive")
    checkpointDir.foreach(edges.sparkSession.sparkContext.setCheckpointDir)
    def ckpt(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint()
    val e = edges.select(col(srcCol).as("__graft_src"), col(dstCol).as("__graft_dst"))
    val nodes = ckpt(e.select(col("__graft_src").as("node"))
      .unionAll(e.select(col("__graft_dst").as("node")))
      .distinct())
    val nTbl = nodes.agg(count(lit(1)).as("__graft_nn"))
    val outdeg = e.groupBy(col("__graft_src").as("node"))
      .agg(count(lit(1)).as("__graft_deg"))
    var scores = ckpt(nodes.crossJoin(broadcast(nTbl))
      .select(col("node"),
        expr(s"${scale}L div __graft_nn").as("rank_scaled")))
    (1 to iters).foreach { _ =>
      val contrib = e
        .join(scores.join(outdeg, Seq("node"))
          .select(col("node").as("__graft_src"),
            expr("rank_scaled div __graft_deg").as("__graft_c")),
          Seq("__graft_src"))
        .groupBy(col("__graft_dst").as("node"))
        .agg(sum("__graft_c").as("__graft_in"))
      scores = ckpt(nodes.crossJoin(broadcast(nTbl))
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (expr(s"(15 * ${scale}L) div (100 * __graft_nn)") +
            expr("(85 * coalesce(__graft_in, 0L)) div 100")).as("rank_scaled")))
    }
    scores
  }
}
