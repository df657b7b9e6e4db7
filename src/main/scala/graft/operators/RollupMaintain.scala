package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of a materialized additive rollup: apply a
  * keyed insert/retract delta batch to a (count + sums) aggregate WITHOUT
  * rescanning the base fact table — the nightly-rollup sibling of
  * [[CdcApply]] (which maintains row-grain snapshots). At 100 TB the
  * rollup is group-grain metadata while the fact history is not;
  * re-aggregating all history for every correction/purge batch is the
  * anti-pattern this operator removes.
  *
  * Delta schema contract: `keyCols ++ measureCols ++ (op STRING)`, op ∈
  * {I, D} — a D retracts ONE previously-absorbed row with exactly these
  * measure values (the retract-stream convention). Updates travel as
  * D(old) + I(new). Any other op value raises.
  *
  * Semantics: `new_count = old_count + Σ(±1)`, each sum column
  * `new_sum = old_sum ± measure`; groups reaching count 0 drop from the
  * rollup; a count going NEGATIVE raises loudly — a retraction the rollup
  * never absorbed is corruption, not data. min/max are deliberately NOT
  * maintainable here (retracting the max needs history); counts and sums
  * only, which is also exactly what re-aggregates.
  *
  * '''Plan shape (100 TB).''' The delta batch collapses to group grain
  * FIRST (one aggregate, map-side combined — a billion-row purge feed
  * ships one row per touched group per map task), then ONE full-outer
  * null-safe equi-join against the group-grain base. No window, no
  * collect, no scan of the base facts. */
object RollupMaintain {

  /** `base` (schema `keyCols ++ (countCol LONG) ++ sumCols`, one row per
    * group) advanced by `delta` (schema `keyCols ++ sumCols ++ (opCol)`,
    * row grain). Output schema = the base's. */
  def applyAggDelta(
      base: DataFrame,
      delta: DataFrame,
      keyCols: Seq[String],
      countCol: String,
      sumCols: Seq[String],
      opCol: String = "op"): DataFrame = {
    require(keyCols.nonEmpty, "need at least one group key")
    val sgn = when(col(opCol) === "I", 1L)
      .when(col(opCol) === "D", -1L)
      .otherwise(raise_error(concat(
        lit("RollupMaintain: op must be I or D, got "), col(opCol)))
        .cast("long"))
    val dAggs = sum(sgn).as("__dn") +:
      sumCols.map(c => sum(sgn * col(c)).as(s"__d_$c"))
    val dAgg = delta
      .groupBy(keyCols.map(c => col(c).as(s"__k_$c")): _*)
      .agg(dAggs.head, dAggs.tail: _*)
    // NULL-SAFE join and NULL-safe key coalesce: a NULL group key is an
    // ordinary group to groupBy, so it must be one here too
    val cond = keyCols.map(c => col(c) <=> col(s"__k_$c")).reduce(_ && _)
    val merged = base.join(dAgg, cond, "full_outer")
      .withColumn("__n",
        coalesce(col(countCol), lit(0L)) + coalesce(col("__dn"), lit(0L)))
    val guarded = merged.withColumn("__n",
      when(col("__n") < 0, raise_error(concat(
        lit("RollupMaintain: group count went negative — retraction of a " +
          "row the rollup never absorbed"))).cast("long"))
        .otherwise(col("__n")))
    val outKeys = keyCols.map(c =>
      coalesce(col(c), col(s"__k_$c")).as(c))
    val outSums = sumCols.map(c =>
      (coalesce(col(c), lit(0L)) + coalesce(col(s"__d_$c"), lit(0L))).as(c))
    guarded
      .filter(col("__n") > 0)
      .select(outKeys ++ (col("__n").as(countCol) +: outSums): _*)
  }
}
