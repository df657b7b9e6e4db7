package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Kaplan–Meier risk table — time-to-event analytics with right-censoring:
  * "how long until a signed-up user first purchases", "how long until a
  * crawled domain goes stale", with subjects still unobserved at cutoff
  * counted honestly as CENSORED instead of silently dropped (dropping them
  * biases every duration metric toward the fast converters — the classic
  * retention-analysis mistake).
  *
  * This emits the exact integer risk table `(t, n_risk, d, c)` — subjects
  * still at risk entering time t, events at t, censorings at t — which IS
  * the Kaplan–Meier estimator's sufficient statistic: the survival curve
  * is the running product of `(1 − d/n_risk)`, a float the caller can fold
  * in one pass; the table itself stays engine-exact (the product telescopes
  * differently under float rounding, so the CONTRACT surface is the
  * integer table, the same discipline as [[Trend]]'s ppm slopes).
  *
  * '''Plan shape (100 TB).''' One map-side-combined groupBy of the
  * per-subject durations to the t-grid, then ONE descending running sum
  * over that grid: `n_risk(t) = Σ_{t' ≥ t} (d + c)` — the reverse
  * cumulative needs no separate total pass and no per-subject window. The
  * grid window is partitionless by design: its frame is the #distinct-t
  * domain (days/weeks of horizon), never subjects.
  */
object Survival {

  /** Risk table over per-subject durations: one input row per subject with
    * integral `tCol` (duration units, ≥ 0) and `eventCol` ∈ {0, 1}
    * (1 = event observed at t, 0 = censored at t). */
  def kmRiskTable(durations: DataFrame, tCol: String, eventCol: String): DataFrame = {
    val e = col(eventCol).cast("long")
    val guarded = when(e.isNull || (e =!= 0L && e =!= 1L),
      raise_error(concat(lit("kmRiskTable: event flag must be 0 or 1, got "),
        coalesce(e.cast("string"), lit("null"))))).otherwise(e)
    val g = durations
      .groupBy(col(tCol).cast("long").as("t"))
      .agg(sum(guarded).as("d"), sum(lit(1L) - guarded).as("c"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("t").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    g.withColumn("n_risk", sum(col("d") + col("c")).over(w))
      .select("t", "n_risk", "d", "c")
  }
}
