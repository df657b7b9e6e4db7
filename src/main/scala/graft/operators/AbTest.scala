package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-proportion A/B significance testing in exact integer arithmetic —
  * the experimentation read-out ("did the treatment move conversion, and
  * is the move larger than noise") computed without a single libm call.
  *
  * The pooled two-proportion z statistic is
  * `z² = (p₁−p₂)² / (p̂(1−p̂)(1/n₁+1/n₂))` with `p̂ = (x₁+x₂)/(n₁+n₂)`.
  * Clearing denominators turns the 95% two-sided decision `z² > 1.96²`
  * into a PURE INTEGER comparison:
  *
  *   `625 · D² · n  >  2401 · n₁ · n₂ · x · (n − x)`
  *
  * where `D = x₁n₂ − x₂n₁`, `x = x₁+x₂`, `n = n₁+n₂`, and
  * `1.96² = 3.8416 = 2401/625` exactly. Both sides run in decimal(38,0)
  * (D² alone reaches ~10²⁰ at 10⁵-user cohorts; HUGEINT in the oracle),
  * so the verdict is bit-identical in any engine — no float variance, no
  * sqrt, no normal-CDF table. Degenerate cohorts (n₁=0 or n₂=0) yield
  * NULL delta and a false verdict; zero-variance pools (x=0 or x=n) yield
  * RHS 0 and LHS 0, correctly insignificant. Exactness bound: the LHS is
  * ~625·D²·n ≤ 625·n⁵/16 (D ≤ n₁n₂ binds, not the RHS's ~n⁴·2401), which
  * exits decimal(38,0) near n ≈ 1.2·10⁷ total units — so the operator
  * FAILS LOUDLY above 10⁷ units rather than letting Spark's non-ANSI
  * decimal overflow return a silent NULL verdict (and the oracle's
  * HUGEINT error) on a wildly significant test. Beyond that, pre-aggregate
  * units (e.g. test at the account grain) before calling.
  *
  * '''Plan shape (the 100-TB design).''' Cohort totals are ONE 1-row
  * aggregate over the unit frame (broadcast back); per-metric conversion
  * counts are one map-side-combined aggregate over the distinct
  * (unit, metric) frame joined to unit-grain cohort labels. Nothing is
  * ever metric × unit materialized beyond the conversion rows themselves.
  */
object AbTest {

  /** Per-metric two-proportion test. `units` must be unit-grain (one row
    * per experimental unit) with a boolean-valued `isACol`; `conversions`
    * lists (unit, metric) pairs — duplicates are collapsed, a unit either
    * converted on a metric or did not. Returns one row per metric:
    * `(metric, n_a, x_a, n_b, x_b, delta_ppm, significant)` with
    * `delta_ppm` the sign-split truncated ppm of `x₁/n₁ − x₂/n₂`. */
  def twoProportionTest(
      units: DataFrame, unitCol: String, isACol: String,
      conversions: DataFrame, convUnitCol: String, metricCol: String)
      : DataFrame = {
    val u = units.select(col(unitCol).as("__u"), col(isACol).as("__a"))
    val totals = u.agg(
        sum(when(col("__a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("__a"), 1L).otherwise(0L)).as("n_b"))
      // loud exactness guard: past ~1.2·10⁷ total units the LHS decimal
      // overflows to NULL (a silent wrong verdict) — fail instead
      .select(
        when(col("n_a") + col("n_b") > 10000000L,
          raise_error(concat(
            lit("twoProportionTest: cohorts total more than 1e7 units ("),
            (col("n_a") + col("n_b")).cast("string"),
            lit(") — the integer z² exceeds decimal(38,0); " +
              "pre-aggregate units before testing"))))
          .otherwise(col("n_a")).as("n_a"),
        col("n_b"))
    val x = conversions
      .select(col(convUnitCol).as("__u"), col(metricCol).as("metric"))
      .distinct()
      .join(u, Seq("__u"))
      .groupBy("metric")
      .agg(sum(when(col("__a"), 1L).otherwise(0L)).as("x_a"),
        sum(when(!col("__a"), 1L).otherwise(0L)).as("x_b"))
    val D: Column = expr(
      "cast(x_a as decimal(38,0)) * n_b - cast(x_b as decimal(38,0)) * n_a")
    x.crossJoin(broadcast(totals))
      .withColumn("__d", D)
      .withColumn("delta_ppm",
        when(col("n_a") === 0L || col("n_b") === 0L, lit(null).cast("long"))
          .otherwise(expr(
            "cast(CASE WHEN __d >= 0 THEN (__d * 1000000) div" +
              " (cast(n_a as decimal(38,0)) * n_b)" +
              " ELSE -((-__d * 1000000) div (cast(n_a as decimal(38,0)) * n_b))" +
              " END as bigint)")))
      .withColumn("significant",
        col("n_a") > 0L && col("n_b") > 0L && expr(
          "625 * __d * __d * (cast(n_a as decimal(38,0)) + n_b) >" +
            " 2401 * cast(n_a as decimal(38,0)) * n_b" +
            " * (cast(x_a as decimal(38,0)) + x_b)" +
            " * (cast(n_a as decimal(38,0)) + n_b - x_a - x_b)"))
      .select("metric", "n_a", "x_a", "n_b", "x_b", "delta_ppm", "significant")
  }
}
