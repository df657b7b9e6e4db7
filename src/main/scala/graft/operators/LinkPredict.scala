package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Neighborhood-overlap link prediction over a bipartite edge list — the
  * classic co-occurrence signal (users sharing items, docs sharing
  * entities, accounts sharing devices) behind recommendation candidates
  * and entity-resolution blocking. Scores each pair of left-nodes by:
  *
  *  - `cn` — common-neighbor count (Newman), and
  *  - `ra_ppm` — resource allocation (Zhou/Lü/Zhang 2009): `Σ 1/deg(v)`
  *    over shared right-nodes `v`, kept exact as the integer
  *    `Σ (10⁶ div deg(v))` so the score is engine-portable (no floating
  *    accumulation order).
  *
  * '''Scale design.''' Pair generation is the per-right-node self-join —
  * inherently `Σ deg(v)²` work, and a single viral right-node (the item
  * everyone touched) is the classic quadratic hot spot. `maxViaDegree`
  * excludes right-nodes above the cap *before* the self-join (standard in
  * production link prediction: a node shared by millions carries ~zero
  * predictive signal — its RA contribution is `10⁶/deg ≈ 0` — but 10¹²
  * pairs of cost). What remains is: one distinct over edges, a node-scale
  * degree aggregate (map-side combined), a degree attach co-partitioned
  * with the wedge self-join on the right-node key, and a map-side-combined
  * pair count — all equi-joins, no cross product, output bounded by
  * `minCommon`.
  */
object LinkPredict {

  /** Score left-node pairs of a bipartite edge list by shared right-node
    * overlap. Returns `(id_a, id_b, cn, ra_ppm)` with `id_a < id_b`,
    * `cn ≥ minCommon`, right-nodes of degree > `maxViaDegree` ignored. */
  def commonNeighborPairs(
      edges: DataFrame,
      leftCol: String,
      rightCol: String,
      minCommon: Int = 2,
      maxViaDegree: Int = 10000): DataFrame = {
    require(minCommon >= 1, s"minCommon must be at least 1: got $minCommon")
    require(maxViaDegree >= 1, s"maxViaDegree must be at least 1: got $maxViaDegree")
    // one materialization of the deduped edge list, partitioned by the
    // right-node key all three consumers (degree agg, both wedge legs)
    // shuffle on
    val e = edges
      .filter(col(leftCol).isNotNull && col(rightCol).isNotNull)
      .select(col(leftCol).as("__s"), col(rightCol).as("__v"))
      .distinct()
      .repartition(col("__v"))
      .localCheckpoint()
    val deg = e.groupBy("__v").agg(count(lit(1)).as("__d"))
      .filter(col("__d") <= maxViaDegree)
    // degree attach doubles as the hot-node filter: capped right-nodes
    // never enter the self-join
    val ewd = e.join(deg, "__v")
    val pairs = ewd.select(col("__v"), col("__s").as("__sa"), col("__d"))
      .join(ewd.select(col("__v"), col("__s").as("__sb")), "__v")
      .filter(col("__sa") < col("__sb"))
    pairs
      .groupBy(col("__sa").as("id_a"), col("__sb").as("id_b"))
      .agg(count(lit(1)).as("cn"),
        sum(expr("1000000 div __d")).as("ra_ppm"))
      .filter(col("cn") >= minCommon)
  }
}
