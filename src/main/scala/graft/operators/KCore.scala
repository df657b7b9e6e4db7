package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core extraction by synchronous peeling: each round deletes EVERY node
  * whose degree in the current subgraph is below k, until nothing changes
  * (Seidman, "Network structure and minimum degree", Social Networks 5,
  * 1983). The k-core is the densely-engaged kernel of a graph — over a
  * near-duplicate or co-occurrence graph it separates the tightly
  * interlinked cluster hearts from stragglers that [[Communities]] or
  * [[ConnectedComponents]] still attach to a component.
  *
  * Determinism: synchronous peeling is order-independent (the set of
  * sub-k nodes in a round is a pure function of the current subgraph), so
  * a FIXED round count gives a result that is a pure function of the edge
  * list — replayable as unrolled SQL rounds by the oracle. The true core
  * is the fixed point; `rounds` bounds work, and a graph that stops
  * changing early just re-confirms itself on the remaining rounds.
  *
  * '''Plan shape (the 100-TB design).''' Per round: one map-side-combined
  * degree aggregate and two equi-joins of the adjacency against the
  * surviving-node set — all keyed by node id, skewJoin-compatible, no
  * windows, no driver-side graph. The adjacency is localCheckpointed each
  * round to truncate lineage (the [[ConnectedComponents]]/[[PageRank]]
  * iteration rule); survivors-only adjacency shrinks monotonically, so
  * later rounds cost less, not more.
  */
object KCore {

  /** (id, degree) of nodes surviving `rounds` synchronous peels at
    * threshold `k`, with `degree` their degree in the surviving subgraph
    * (any edge orientation; duplicates and self-loops dropped). */
  def kCore(edges: DataFrame, aCol: String, bCol: String,
      k: Int, rounds: Int = 3): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(rounds >= 1, s"rounds must be positive, got $rounds")
    val canon = edges
      .filter(col(aCol) =!= col(bCol))
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .distinct()
    var adj = canon.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(canon.select(col("b").as("src"), col("a").as("dst")))
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      val keep = adj.groupBy("src").agg(count(lit(1)).as("__d"))
        .filter(col("__d") >= k)
        .select(col("src").as("__keep"))
      adj = adj
        .join(keep.withColumnRenamed("__keep", "src"), "src")
        .join(keep.withColumnRenamed("__keep", "dst"), "dst")
        .select("src", "dst")
        .localCheckpoint()
    }
    adj.groupBy(col("src").as("id")).agg(count(lit(1)).as("degree"))
  }
}
