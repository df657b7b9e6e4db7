package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group single change-point detection — "WHEN did this metric jump"
  * beside [[Cusum]]'s "has it drifted" and [[Trend]]'s "how fast is it
  * moving": the first step of binary segmentation, locating the grid point
  * that best splits the series into two halves with maximally different
  * means. Deployment-regression hunting, crawl-quality cliffs, A/B ramp
  * detection — every monitoring pipeline wants the WHERE, not just the
  * whether.
  *
  * '''Exactness contract.''' Caller supplies an integer GRID key `x`
  * (epoch day/hour — the estimator is O(grid) per group after the
  * grid collapse, never O(rows)) and integer `y` (metric floor-quantized
  * to micro-units). Rows collapse to per-(group, x) sums; with prefix sums
  * `S_t` over the first `t` of `n` grid points (ordered by `x`), the
  * candidate split after position `t` (1 ≤ t < n) scores the exact
  * mean difference `Δ_t = (S_n − S_t)/(n−t) − S_t/t`, reported as
  * truncated-toward-zero ppm: `shift_ppm = sign(num_t)·((|num_t|·10⁶) div
  * (t·(n−t)))` with `num_t = t·S_n − n·S_t` (the cross-multiplied
  * difference — `(S_n−S_t)·t − S_t·(n−t) = t·S_n − n·S_t`). The reported
  * change point is the argmax of `|shift_ppm|` (the TRUNCATED score — the
  * documented convention; exact-rational cross-comparison of every t pair
  * is O(grid²) for a last-ulp nicety), ties to the EARLIEST grid `x`.
  * Groups with fewer than two grid points have no split and are absent.
  *
  * '''Plan shape (100 TB).''' One map-side-combined corpus pass to the
  * (group, x) grid, then two windows partitioned BY GROUP over the grid
  * frame (prefix sum + argmax rank) — partition-bounded at grid size
  * (≤ a few thousand points per group at any horizon), never a
  * corpus-grain window, never a per-candidate self-join.
  */
object ChangePoint {

  /** Per-group `(groupCols*, n_grid, split_x, shift_ppm)`: the grid point
    * AFTER which the best mean split occurs (the left half is
    * `x ≤ split_x`), with the truncated fixed-point mean shift
    * (right minus left). */
  def meanShiftChangePoint(
      df: DataFrame,
      groupCols: Seq[String],
      x: Column,
      y: Column): DataFrame = {
    val dec: Column => Column = _.cast("decimal(38,0)")
    val grid = df.select(
      groupCols.map(col) ++ Seq(
        x.cast("long").as("__x"), y.cast("long").as("__y")): _*)
      .filter(col("__x").isNotNull && col("__y").isNotNull)
      .groupBy(groupCols.map(col) :+ col("__x"): _*)
      .agg(sum(dec(col("__y"))).as("__y"))
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(col("__x"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
    val scored = grid
      .withColumn("__t", count(lit(1)).over(wOrd))
      .withColumn("__st", sum(col("__y")).over(wOrd))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__sn", sum(col("__y")).over(wAll))
      .filter(col("__t") < col("__n")) // a split needs a non-empty right half
      .withColumn("__num",
        dec(col("__t")) * col("__sn") - dec(col("__n")) * col("__st"))
      .withColumn("shift_ppm",
        (when(col("__num") < 0, -1L).otherwise(1L) *
          expr("(abs(__num) * 1000000) div (cast(__t as decimal(38,0)) * (__n - __t))"))
          .cast("long"))
    scored
      .withColumn("__rn", row_number().over(
        wAll.orderBy(abs(col("shift_ppm")).desc, col("__x"))))
      .filter(col("__rn") === 1)
      .select(groupCols.map(col) ++ Seq(
        col("__n").as("n_grid"), col("__x").as("split_x"),
        col("shift_ppm")): _*)
  }
}
