package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CUSUM level-shift detection over a pre-aggregated series (Page,
  * "Continuous inspection schemes", Biometrika 1954): the one-sided
  * cumulative-sum statistic `s_i = max(0, s_{i-1} + (x_i − mean))` flags a
  * SUSTAINED rate shift — the drift the trailing-window spike rule
  * (`events_anomaly`) is blind to, because a +20% step never trips a
  * 2×-trailing-mean threshold while CUSUM accumulates it linearly.
  *
  * '''No sequential recurrence.''' The max-recurrence unrolls to
  * `s_i = D_i − min_{j ≤ i} D_j` with `D_i = P_i − mean·i` (P the prefix
  * sum): two cumulative window functions, no iterative loop — the same
  * associative-scan trick that makes the statistic SQL-replayable.
  *
  * '''Integer-exact.''' The per-step mean is the floor of
  * `total × 10⁶ / steps` (micro units): all drift arithmetic is long
  * integers, bit-identical across engines; the floor costs < 1 micro/step
  * of slope — noise against any useful threshold. The flag fires when
  * `cusum_micro > h × mean_micro` (h whole "mean steps" of accumulated
  * surplus — the standard h·σ form with σ replaced by the mean, keeping
  * the rule transcendental-free).
  *
  * '''Plan shape (100-TB).''' Input is a pre-aggregated series (group ×
  * step grain — counts aggregate map-side BEFORE this), so the windows
  * run over #groups × #steps rows, each partition one group's bounded
  * series — never over raw events.
  */
object Cusum {

  /** Adds `cusum_micro` (≥ 0) and `is_shift` to a series of
    * (`groupCols`, `orderCol`, `valueCol`) rows. `h` = accumulated
    * surplus, in per-step means, at which the flag fires. Group keys must
    * be non-null (the stats join is key-equality; a NULL-keyed series
    * would silently drop). The running minimum is floored at `D_0 = 0` —
    * a series that surges from step 1 measures its surplus from zero, not
    * from its own first dip. */
  def cusumDrift(series: DataFrame, groupCols: Seq[String],
      orderCol: String, valueCol: String, h: Long = 3L): DataFrame = {
    require(h >= 1, s"h must be positive, got $h")
    val part = Window.partitionBy(groupCols.map(col): _*)
    val cum = part.orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val stats = series.groupBy(groupCols.map(col): _*)
      .agg(sum(col(valueCol)).as("__t"), count(lit(1)).as("__steps"))
      .select(groupCols.map(col) :+
        expr("cast(__t as decimal(38,0)) * 1000000 DIV __steps")
          .as("__mean_micro"): _*)
    // drift arithmetic in decimal(38,0): the prefix-sum ×10⁶ product
    // overflows int64 once a group's cumulative total passes ~9.2e12 —
    // same overflow class as gini_ppm (the DuckDB oracle's window-sum is
    // HUGEINT, so 128-bit is also what bit-identity requires). The final
    // cusum_micro surplus is cast back to long, mirroring the oracle's
    // ::BIGINT.
    val dec = "decimal(38,0)"
    series
      .join(broadcast(stats), groupCols)
      .withColumn("__i", row_number().over(part.orderBy(orderCol)))
      .withColumn("__d",
        sum(col(valueCol)).over(cum).cast(dec) * 1000000L -
          col("__mean_micro").cast(dec) * col("__i"))
      .withColumn("__s", col("__d") - least(lit(0L).cast(dec), min(col("__d")).over(cum)))
      .withColumn("cusum_micro", col("__s").cast("long"))
      .withColumn("is_shift", col("__s") > col("__mean_micro").cast(dec) * h)
      .drop("__i", "__d", "__s", "__mean_micro")
  }
}
