package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the "group the
  * near-duplicate pairs into clusters" step of a dedup pipeline, where the
  * pairwise output of MinHash/SimHash/winnowing becomes per-document cluster
  * ids (component = smallest doc id reachable through any chain of pairs).
  *
  * The reference engine has no graph operator; this is north-star extension
  * surface (SURVEY.md §2.4 family) needed to turn pair sets into a
  * transitive keep/drop policy at corpus scale.
  *
  * '''Algorithm (the 100-TB design).''' Alternating large-star / small-star
  * (Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14):
  * each round is two rounds of `groupBy(min)` + equi-join on node ids — pure
  * shuffle-on-key dataflow, no driver-side adjacency, no collect. It
  * converges in O(log²|V|) rounds even on path graphs (a naive min-label
  * propagation needs diameter rounds — 10⁶ for a 10⁶-chain), and every
  * intermediate edge set is at most the input size after `distinct()`.
  *
  * Per-iteration `localCheckpoint` truncates the logical plan, which
  * otherwise doubles per round and overwhelms the optimizer by iteration ~8
  * (on a production cluster with a fault-tolerance requirement, swap for
  * reliable `checkpoint` to a cluster store; the dataflow is identical).
  *
  * Iteration is driver-coordinated but all data stays distributed: the only
  * driver-side values are the 2-long convergence signature per round.
  */
object ConnectedComponents {

  /** (node, component) for every node appearing in `pairs`, where component
    * is the minimum node id in the node's connected component. Null ids and
    * self-pairs are dropped. */
  def connectedComponents(
      pairs: DataFrame,
      idA: String = "id_a",
      idB: String = "id_b",
      maxIter: Int = 25): DataFrame = {
    var edges = pairs
      .filter(col(idA).isNotNull && col(idB).isNotNull && col(idA) =!= col(idB))
      .select(least(col(idA), col(idB)).as("lo"), greatest(col(idA), col(idB)).as("hi"))
      .distinct()
      .localCheckpoint()

    var sig = edgeSig(edges)
    var converged = edges.isEmpty
    var it = 0
    while (!converged && it < maxIter) {
      val next = smallStar(largeStar(edges)).localCheckpoint()
      val nextSig = edgeSig(next)
      converged = nextSig == sig
      sig = nextSig
      edges = next
      it += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter iterations")

    // At the fixpoint the edge set is a union of stars: every edge links a
    // node directly to its component's minimum. The groupBy(min) is belt and
    // braces (a star already has one edge per non-root node).
    edges.select(col("hi").as("node"), col("lo").as("component"))
      .union(edges.select(col("lo").as("node"), col("lo").as("component")))
      .groupBy("node")
      .agg(min("component").as("component"))
  }

  /** Incremental connected components — the daily-ingest shape: fold a
    * batch of NEW pairs into an existing (node, component) assignment
    * without re-clustering the historical corpus.
    *
    * '''Exactness.''' A component's membership can change only if it
    * contains an endpoint of a new pair (merging happens exclusively
    * through new edges), so the affected component ids are EXACTLY the
    * assignment components of the new pairs' endpoints — a set bounded by
    * 2·|newPairs|, broadcast. Untouched components pass through verbatim;
    * the star edges of affected components union with the new pairs and
    * re-cluster through the same large/small-star loop. The result equals
    * full [[connectedComponents]] over (historical connectivity ∪ new
    * pairs): an assignment is a star edge set preserving its components'
    * connectivity and minimum ids.
    *
    * '''Scale shape.''' Per batch: one broadcast semi/anti split of the
    * assignment (narrow probe, no shuffle of the corpus by component), then
    * the CC loop over the affected region only — O(affected + new), not
    * O(corpus). Fresh nodes absent from the assignment cluster via the new
    * pairs directly. */
  def incrementalComponents(
      assignment: DataFrame,
      newPairs: DataFrame,
      idA: String = "id_a",
      idB: String = "id_b",
      maxIter: Int = 25): DataFrame = {
    // localCheckpoint the (near-dup-sized) pair list ONCE: it is typically
    // the expensive lineage here (an LSH pipeline in the dedup flow) and
    // has two independent consumers — the affected-set computation and the
    // CC loop's initial edge set. Cutting at the pairs, not the affected
    // set, covers both. The operator already runs eager jobs (the CC loop
    // below), so an eager checkpoint changes nothing structural.
    val pairs = newPairs
      .filter(col(idA).isNotNull && col(idB).isNotNull && col(idA) =!= col(idB))
      .select(col(idA), col(idB))
      .localCheckpoint()
    val ends = pairs.select(col(idA).as("node"))
      .union(pairs.select(col(idB).as("node"))).distinct()
    val affected = assignment.join(ends, Seq("node"), "left_semi")
      .select("component").distinct()
    val (touched, untouched) = splitByAffected(assignment, affected)
    // a star's root carries the self-row (r, r); its connectivity is
    // preserved by the member edges, and a root with no members is a
    // singleton that is itself a new-pair endpoint (else not affected)
    val starEdges = touched
      .filter(col("node") =!= col("component"))
      .select(col("node").as(idA), col("component").as(idB))
    connectedComponents(starEdges.unionByName(pairs), idA, idB, maxIter)
      .unionByName(untouched.select("node", "component"))
  }

  /** The assignment split [[incrementalComponents]] runs: both probes of
    * the (bounded, broadcast) affected-component set. Exposed so the plan
    * shape — broadcast probes, never a shuffle of the assignment by
    * component — is pinned directly in PlanSpec even though the operator
    * consumes the touched side eagerly. */
  private[graft] def splitByAffected(
      assignment: DataFrame, affected: DataFrame): (DataFrame, DataFrame) = (
    assignment.join(broadcast(affected), Seq("component"), "left_semi"),
    assignment.join(broadcast(affected), Seq("component"), "left_anti"))

  /** Directed neighbor view of canonical (lo < hi) edges: both orientations. */
  private def directed(e: DataFrame): DataFrame =
    e.select(col("lo").as("x"), col("hi").as("y"))
      .union(e.select(col("hi").as("x"), col("lo").as("y")))

  /** Large-star: every node x links its LARGER neighbors to the minimum of
    * its neighborhood (incl. itself) — long chains collapse toward small ids
    * from every node in parallel. Emitted edges (m, y) satisfy m ≤ x < y. */
  private def largeStar(e: DataFrame): DataFrame = {
    val d = directed(e)
    val m = d.groupBy("x").agg(min("y").as("mn"))
      .select(col("x"), least(col("x"), col("mn")).as("m"))
    d.filter(col("y") > col("x"))
      .join(m, Seq("x"))
      .select(col("m").as("lo"), col("y").as("hi"))
      .distinct()
  }

  /** Small-star: every node x links its SMALLER neighbors (and itself) to
    * the minimum among them — flattening the partial trees into stars. */
  private def smallStar(e: DataFrame): DataFrame = {
    val d = e.select(col("hi").as("x"), col("lo").as("y"))
    val m = d.groupBy("x").agg(min("y").as("m"))
    val linked = d.join(m, Seq("x"))
      .select(col("m").as("lo"), col("y").as("hi"))
      .filter(col("lo") =!= col("hi"))
    val self = m.select(col("m").as("lo"), col("x").as("hi"))
    linked.union(self).distinct()
  }

  /** Cheap convergence signature: (edge count, sum of per-edge hashes).
    * Collision probability per comparison ~2⁻⁶⁴; a false positive would only
    * stop one round early on an already-star-shaped set. */
  private def edgeSig(e: DataFrame): (Long, String) = {
    // decimal(38,0) accumulator: a long sum of 2⁶³-scale hashes overflows
    // under ANSI arithmetic after a handful of edges
    val r = e.agg(
      count(lit(1)).as("n"),
      sum(xxhash64(col("lo"), col("hi")).cast("decimal(38,0)")).as("h")).head()
    (r.getLong(0), if (r.isNullAt(1)) "0" else r.getDecimal(1).toBigInteger.toString)
  }
}
