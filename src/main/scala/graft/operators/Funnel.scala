package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered funnel analysis: how many users performed step 1, then step 2
  * strictly after it, then step 3 strictly after that, … — the classic
  * product-analytics conversion funnel, here as a deterministic batch
  * operator over an events table.
  *
  * Each stage is one conditional aggregate per user — `min(ts) WHERE
  * type = step AND ts > previous stage's ts` — so the whole funnel is
  * `numSteps` map-side-combined aggregates joined on the user key: no
  * windows, no per-user sorts, no row explosion; a hot user costs one
  * combiner entry per map task. Earliest-completion semantics (always the
  * smallest qualifying timestamp per stage) make the result a pure
  * function of the data.
  *
  * '''Plan shape.''' The result is ONE deferred DataFrame — a union of one
  * global-count row per stage — so no cluster work happens at construction
  * time, and consuming it runs a single job. Stage k's count branch and
  * stage k+1's join branch both read stage k's per-user aggregate through
  * the SAME exchange subtree (the `reached` frames are shared plan
  * objects), which Spark's ReusedExchange dedupes; the events table is
  * therefore scanned once per step — each scan a filter-pushed slice of
  * one step's type, disjoint slices when the steps are distinct — not the
  * O(steps²) a naive per-stage action would cost. FunnelSpec pins the
  * scan count mechanically.
  *
  * Returns one row per funnel step: (step index, step name, users reaching
  * that step). */
object Funnel {

  def funnel(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // stage 0: earliest step-0 event per user; stage k: earliest step-k
    // event strictly after the user's stage-(k-1) timestamp. NULL-SAFE join
    // on the user key — groupBy made NULL a group in stage 0, so later
    // stages must not silently drop it.
    val stage0 = events
      .filter(col(typeCol) === steps.head)
      .groupBy(col(userCol).as("__u"))
      .agg(min(col(tsCol)).as("__t"))
    val reached = steps.drop(1).scanLeft(stage0) { (prev, step) =>
      events
        .filter(col(typeCol) === step)
        .select(col(userCol).as("__eu"), col(tsCol).as("__ts"))
        .join(prev, col("__eu") <=> col("__u"))
        .filter(col("__ts") > col("__t"))
        .groupBy(col("__eu").as("__u"))
        .agg(min(col("__ts")).as("__t"))
    }
    // The count is sum(isnull(__t)+isnotnull(__t)) — exactly 1 per row, so
    // an exact row count — NOT count(1): the count branch must reference
    // __t, else column pruning rewrites its copy of the stage aggregate to
    // a min-less variant whose exchange no longer matches the next stage's
    // join branch, and ReusedExchange can't dedupe them (count(array(__t))
    // doesn't survive either — NullPropagation folds count(non-nullable)
    // back to count(1)). With the identical subtrees, one job scans each
    // step's filter-pushed events slice exactly once.
    val one = isnull(col("__t")).cast("long") + isnotnull(col("__t")).cast("long")
    reached.zip(steps).zipWithIndex.map { case ((r, name), i) =>
      r.agg(coalesce(sum(one), lit(0L)).as("n_users"))
        .select(lit(i.toLong).as("step"), lit(name).as("step_name"),
          col("n_users"))
    }.reduce(_.union(_)).orderBy("step")
  }

  /** Conversion-window funnel: like [[funnel]], but every later step must
    * land within `windowNs` of the user's FIRST step-1 event — the
    * first-touch-anchored convention product analytics uses ("signed up,
    * then activated within 24 h"). With the upper bound fixed at
    * `t₀ + windowNs`, earliest-completion greediness is EXACT chain
    * existence: taking the smallest qualifying timestamp per stage only
    * loosens later stages' lower bounds and never their shared upper
    * bound. (An un-anchored per-step window would NOT have that property —
    * greedy could miss chains a later anchor admits — which is why the
    * anchor convention is part of the operator's contract.) Same
    * one-aggregate-per-stage, ReusedExchange-deduped plan as [[funnel]]. */
  def timedFunnel(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String],
      windowNs: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(windowNs > 0, "windowNs must be positive")
    val stage0 = events
      .filter(col(typeCol) === steps.head)
      .groupBy(col(userCol).as("__u"))
      .agg(min(col(tsCol)).as("__t"))
      .withColumn("__t0", col("__t"))
    val reached = steps.drop(1).scanLeft(stage0) { (prev, step) =>
      events
        .filter(col(typeCol) === step)
        .select(col(userCol).as("__eu"), col(tsCol).as("__ts"))
        .join(prev, col("__eu") <=> col("__u"))
        .filter(col("__ts") > col("__t") &&
          col("__ts") <= col("__t0") + lit(windowNs))
        .groupBy(col("__eu").as("__u"))
        .agg(min(col("__ts")).as("__t"), min(col("__t0")).as("__t0"))
    }
    // same ReusedExchange discipline as funnel's `one`, but the stage
    // aggregates here carry BOTH __t and __t0 — the count branch must
    // reference both, or column pruning rewrites its copy to a __t0-less
    // aggregate whose exchange no longer matches the next stage's join
    // branch. Each isnull+isnotnull pair is exactly 1, so (2) div 2 = 1
    // per row (a non-foldable expression over both columns).
    val one = expr(
      "(cast(isnull(__t) as long) + cast(isnotnull(__t) as long)" +
        " + cast(isnull(__t0) as long) + cast(isnotnull(__t0) as long)) div 2")
    reached.zip(steps).zipWithIndex.map { case ((r, name), i) =>
      r.agg(coalesce(sum(one), lit(0L)).as("n_users"))
        .select(lit(i.toLong).as("step"), lit(name).as("step_name"),
          col("n_users"))
    }.reduce(_.union(_)).orderBy("step")
  }
}
