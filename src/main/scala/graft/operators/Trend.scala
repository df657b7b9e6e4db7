package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group exact least-squares trend (OLS slope) in fixed-point integer
  * arithmetic — the drift monitor for "is this metric creeping up" per
  * key: event values over time, doc quality over crawl date, loss over
  * step. One slope per group from the four classic power sums, never a
  * regression library and never a per-group sort.
  *
  * '''Exactness contract.''' Caller supplies integer `x` (e.g. epoch
  * seconds rebased to a fixed anchor) and integer `y` (e.g. a metric
  * floor-quantized to micro-units). The slope is then the exact rational
  * `num/den` with `num = n·Σxy − Σx·Σy`, `den = n·Σx² − (Σx)²`, reported
  * as `slope_ppm = sign(num)·((|num|·10⁶) div den)` — truncation toward
  * zero, so DuckDB's floor `//` on the non-negative `|num|` replays it
  * bit-for-bit. Groups with zero x-variance report NULL (no trend is
  * defined, and silently emitting 0 would read as "flat" — a different
  * claim).
  *
  * '''Overflow envelope.''' Per-row products `x·y`, `x·x` are computed in
  * int64 (caller keeps `|x| ≤ 2³¹`, `|y| ≤ 2³¹` — a month of seconds and
  * micro-quantized metrics sit far inside); the sums and the `n·Σ`
  * cross-terms run in decimal(38,0). With `|x| ≤ 3·10⁶` s and
  * `|y| ≤ 5·10⁸` micro-units, `|num|·10⁶ ≤ n²·1.5·10²¹` stays inside 38
  * digits to n ≈ 10⁸ rows PER GROUP — beyond that, rebase the x anchor
  * (trend windows at 100 TB are per-day/week anyway, which also rebases).
  *
  * '''Plan shape (100 TB).''' One `groupBy` over the group keys with five
  * map-side-combined sums — a single exchange carrying #groups rows of
  * five decimals; no window, no sort, no second pass.
  */
object Trend {

  /** Per-group `(groupCols*, n, slope_ppm)` where `slope_ppm` is the
    * truncated fixed-point OLS slope of `y` over `x` (both integral
    * columns, see exactness contract). */
  def groupedTrend(
      df: DataFrame,
      groupCols: Seq[String],
      x: Column,
      y: Column): DataFrame = {
    val d = df.select(
      groupCols.map(col) ++ Seq(
        x.cast("long").as("__x"), y.cast("long").as("__y")): _*)
      .filter(col("__x").isNotNull && col("__y").isNotNull)
    val dec: Column => Column = _.cast("decimal(38,0)")
    d.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(dec(col("__x"))).as("__sx"),
        sum(dec(col("__y"))).as("__sy"),
        // Cast BEFORE multiplying: an int64 product would wrap silently
        // (non-ANSI) for |x|·|y| ≥ 2^63 while the DuckDB replay errors —
        // decimal(38,0) products are exact for any pair of longs.
        sum(dec(col("__x")) * dec(col("__y"))).as("__sxy"),
        sum(dec(col("__x")) * dec(col("__x"))).as("__sxx"))
      .withColumn("__num",
        dec(col("n")) * col("__sxy") - col("__sx") * col("__sy"))
      .withColumn("__den",
        dec(col("n")) * col("__sxx") - col("__sx") * col("__sx"))
      .withColumn("slope_ppm",
        when(col("__den") === 0, lit(null).cast("long"))
          .otherwise(
            when(col("__num") < 0, lit(-1L)).otherwise(lit(1L)) *
              expr("(abs(__num) * 1000000) div __den")))
      .select(groupCols.map(col) :+ col("n") :+ col("slope_ppm"): _*)
  }
}
