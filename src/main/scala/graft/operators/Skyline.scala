package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pareto frontier (skyline) under two maximized integer criteria — "the
  * docs where you can't improve one axis without giving up the other":
  * token-densest per length, best quality per cost, freshest per size.
  * A row survives iff NO other row is ≥ on both axes and > on at least
  * one (rows tying the frontier point on BOTH axes all survive).
  *
  * '''Plan shape (100 TB).''' Never the O(n²) dominance join: one
  * map-side-combined groupBy collapses the corpus to the per-x grid
  * (`x → max y` + the frontier only needs distinct x values, a
  * DOMAIN-BOUNDED frame for the integer metrics this targets), one
  * descending-x running max over that grid finds the frontier x's
  * (a partitionless window over the #distinct-x grid — bounded by the
  * metric's domain, never corpus rows), and one broadcast semi-join
  * brings back every corpus row sitting ON a frontier point.
  *
  * Exactness: pure integer comparisons end to end — the frontier is the
  * same set any engine computes from the dominance definition, which is
  * exactly how the DuckDB oracle replays it (NOT EXISTS dominating row).
  */
object Skyline {

  /** Rows of `df` on the Pareto frontier of (maximize `x`, maximize `y`).
    * `x` and `y` must be integral; NULL on either axis drops the row (a
    * row with unknown merit can neither dominate nor defensibly survive). */
  def paretoFrontier2D(df: DataFrame, x: Column, y: Column): DataFrame = {
    val base = df.withColumn("__px", x.cast("long"))
      .withColumn("__py", y.cast("long"))
      .filter(col("__px").isNotNull && col("__py").isNotNull)
    // per-x grid: only the max y at each x can be on the frontier
    val grid = base.groupBy(col("__px")).agg(max(col("__py")).as("__my"))
    // frontier x: its max y strictly beats every max y at larger x.
    // Partitionless window BY DESIGN on the #distinct-x grid (domain-
    // bounded); rowsBetween excludes the current row so ties at distinct
    // x are resolved by the strict > (larger-x point dominates via x).
    val w = Window.orderBy(col("__px").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = grid
      .withColumn("__rm", max(col("__my")).over(w))
      .filter(col("__rm").isNull || col("__my") > col("__rm"))
      .select(col("__px").as("__fx"), col("__my").as("__fy"))
    base.join(broadcast(frontier),
        col("__px") === col("__fx") && col("__py") === col("__fy"),
        "left_semi")
      .drop("__px", "__py")
  }
}
