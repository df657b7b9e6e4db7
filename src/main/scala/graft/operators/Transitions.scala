package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-entity event-transition matrix (first-order Markov counts): for each
  * ordered pair of consecutive events of one entity, count how often state
  * `a` is followed by state `b`, plus the total out-degree of `a` so the
  * transition probability `n / n_from` is derivable without a second pass.
  *
  * The path-analysis face of the events family ([[Funnel]] asks "did steps
  * happen in order", [[Sessionize]] asks "which events are one visit";
  * this asks "where do users go next").
  *
  * Scale design: ONE shuffle. The `lead` window partitions by the entity
  * key — the same per-user executor-residency assumption every window in
  * this repo makes (billions of users, bounded events per user). The
  * (from, to) count is a map-side-combinable aggregate over the window
  * output, and `n_from` comes from a second aggregation of the COUNTS
  * (state-cardinality scale, not event scale) joined back broadcast — the
  * events table is never re-scanned and never re-shuffled by state.
  * Output cardinality is |states|², tiny by construction.
  *
  * Counts are exact integers, so results are bit-identical to any engine's
  * replay of the same window (`LEAD ... OVER (PARTITION BY entity ORDER BY
  * ts, tie)` in the DuckDB oracle).
  */
object Transitions {

  /** (from_state, to_state, n, n_from) for each observed transition.
    *
    * @param tieCol unique per-row tiebreaker making the per-entity order
    *               total (and the counts deterministic) when timestamps
    *               collide.
    */
  def transitionCounts(events: DataFrame, entityCol: String, stateCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(entityCol)).orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .withColumn("__graft_next", lead(col(stateCol), 1).over(w))
      .filter(col("__graft_next").isNotNull)
      .select(col(stateCol).as("from_state"), col("__graft_next").as("to_state"))
    val counts = pairs.groupBy("from_state", "to_state").agg(count(lit(1)).as("n"))
    // out-degree totals from the (already tiny) count table, broadcast
    // back; null-safe join so a NULL state keeps its row (the same
    // discipline as GroupedRank's null groups)
    val fromTotals = counts.groupBy("from_state")
      .agg(sum("n").as("n_from")).withColumnRenamed("from_state", "__graft_fs")
    counts.join(broadcast(fromTotals), col("from_state") <=> col("__graft_fs"))
      .select("from_state", "to_state", "n", "n_from")
  }
}
