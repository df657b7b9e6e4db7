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
  * '''Overflow envelope.''' Per-row products `x·y`, `x·x` run in
  * decimal(38,0) (exact for ANY pair of longs — int64 products would wrap
  * silently under non-ANSI Spark while the DuckDB replay errors loudly);
  * the sums and the `n·Σ` cross-terms run in decimal(38,0) too. With `|x| ≤ 3·10⁶` s and
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

  /** Per-group Theil–Sen trend — the MEDIAN of pairwise slopes, the robust
    * twin of [[groupedTrend]]: a handful of outlier days cannot move it
    * (OLS has breakdown point 0; Theil–Sen survives ~29% corruption).
    *
    * '''Exactness contract.''' Caller supplies an integer GRID key `x`
    * (e.g. epoch day — the estimator is O(grid²), so x must be
    * domain-bounded, never a raw event timestamp) and integer `y`; rows
    * collapse to per-(group, x) sums first, each pairwise slope is the
    * exact `sign(Δy)·((|Δy|·10⁶) div Δx)` (truncation toward zero — the
    * sign-split makes DuckDB's floor `//` replay it bit-for-bit), and the
    * median is the lower-middle element (`rank = (n_pairs+1) div 2` of the
    * ascending ordering — an actual measured slope, not an average of
    * two). Groups with fewer than two grid points have no defined slope
    * and are absent from the output.
    *
    * '''Plan shape (100 TB).''' One map-side-combined corpus pass to the
    * (group, x) grid; the grid is localCheckpointed (it feeds both sides
    * of the pair self-join) and everything after — the O(grid²) pair join,
    * the per-group median window — runs on the #groups × #grid-points
    * frame, never on raw rows. */
  def theilSenTrend(
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
      .localCheckpoint()
    val a = groupCols.foldLeft(
      grid.withColumnRenamed("__x", "__xa").withColumnRenamed("__y", "__ya")) {
      (d, c) => d.withColumnRenamed(c, s"__g_$c")
    }
    val pairs = a.join(grid,
      groupCols.map(c => col(s"__g_$c") <=> col(c)).reduce(_ && _) &&
        col("__xa") < col("__x"))
      .withColumn("__dy", col("__y") - col("__ya"))
      .withColumn("slope_ppm",
        (when(col("__dy") < 0, -1L).otherwise(1L) *
          expr("(abs(__dy) * 1000000) div cast(__x - __xa as decimal(38,0))"))
          .cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
    pairs
      .withColumn("__rn", row_number().over(w.orderBy(col("slope_ppm"))))
      .withColumn("__cnt", count(lit(1)).over(w))
      .filter(col("__rn") === expr("(__cnt + 1) div 2")) // integer div: Spark `/` is double
      .select(groupCols.map(col) ++ Seq(
        col("__cnt").as("n_pairs"), col("slope_ppm").as("theilsen_ppm")): _*)
  }

  /** Per-group exponentially-weighted moving average over the (x, y) grid
    * in EXACT integer arithmetic — the smoothing face of this module:
    * [[groupedTrend]] answers "what's the slope", EWMA answers "what's the
    * level right now", the pair every drift monitor wants.
    *
    * Recurrence with α = `aNum`/`aDen`:
    * `s₀ = y₀`; `sₜ = sign(v)·(|v| div aDen)` for
    * `v = aNum·yₜ + (aDen−aNum)·sₜ₋₁` — truncation toward zero at every
    * step (sign-split so DuckDB's floor `//` replays it on the
    * non-negative operand), which makes the whole series a pure integer
    * function of the grid, bit-identical in any engine: the float
    * formulation drifts in the last ulp immediately, and per-step
    * truncation does NOT telescope, so replaying it demands the same
    * step-by-step recurrence (a recursive CTE in SQL).
    *
    * Emits one row per grid point: (groupCols*, x, y, ewma).
    *
    * '''Plan shape (100 TB).''' One map-side-combined corpus pass to the
    * (group, x) grid, then — because each step depends on the previous
    * SMOOTHED value, not the previous row — the per-group fold runs as a
    * single codegen'd higher-order `aggregate` over the group's collected,
    * sorted grid: no window, no UDF, no driver loop. Bounded per-GROUP
    * state is the contract (a daily grid is ≤ a few thousand points per
    * group at any horizon); corpus-scale parallelism is across groups. */
  /** Per-group Holt (double-exponential) smoothing in EXACT integer
    * arithmetic — the trend-AWARE sibling of [[ewmaIntSeries]]: simple
    * EWMA systematically lags a trending series (it averages toward old
    * levels); Holt carries a second smoothed TREND term and projects it
    * into each level update, the standard fix.
    *
    * Recurrence with α = 1/4, β = 1/2 (sign-split truncation at every
    * step, the [[ewmaIntSeries]] exactness discipline):
    * `l₀ = y₀, b₀ = 0`;
    * `lₜ = ±(|yₜ + 3·(lₜ₋₁ + bₜ₋₁)| div 4)`;
    * `bₜ = ±(|(lₜ − lₜ₋₁) + bₜ₋₁| div 2)`.
    * Pure integer function of the grid → bit-identical in any engine (the
    * replay is the same recursive recurrence; per-step truncation does
    * not telescope).
    *
    * Emits one row per grid point: (groupCols*, x, y, level, trend).
    *
    * '''Plan shape (100 TB).''' Identical to [[ewmaIntSeries]]: one
    * map-side-combined corpus pass to the (group, x) grid, then the
    * per-group sequential fold as a single codegen'd higher-order
    * `aggregate` over the sorted bounded grid — no window, no UDF. */
  def holtIntSeries(
      df: DataFrame,
      groupCols: Seq[String],
      x: Column,
      y: Column): DataFrame = {
    val grid = df.select(
      groupCols.map(col) ++ Seq(
        x.cast("long").as("__x"), y.cast("long").as("__y")): _*)
      .filter(col("__x").isNotNull && col("__y").isNotNull)
      .groupBy(groupCols.map(col) :+ col("__x"): _*)
      .agg(sum(col("__y")).as("__y"))
    // the level update is needed twice (for itself and inside the trend
    // update); SQL lambdas bind no intermediates, so it is spelled out —
    // verbose, but still ONE codegen'd expression
    val lvl = """((CASE WHEN p.y + 3L * (element_at(acc, -1).level +
               |    element_at(acc, -1).trend) < 0 THEN -1L ELSE 1L END) *
               |  (abs(p.y + 3L * (element_at(acc, -1).level +
               |    element_at(acc, -1).trend)) div 4L))""".stripMargin
    val folded = grid
      .groupBy(groupCols.map(col): _*)
      .agg(array_sort(collect_list(struct(
        col("__x").as("x"), col("__y").as("y")))).as("__grid"))
      .withColumn("__series", expr(
        s"""aggregate(__grid,
           |  cast(array() as array<struct<x: long, y: long,
           |    level: long, trend: long>>),
           |  (acc, p) -> array_append(acc, CASE WHEN size(acc) = 0
           |    THEN named_struct('x', p.x, 'y', p.y,
           |      'level', p.y, 'trend', 0L)
           |    ELSE named_struct('x', p.x, 'y', p.y,
           |      'level', $lvl,
           |      'trend', (CASE WHEN ($lvl - element_at(acc, -1).level) +
           |          element_at(acc, -1).trend < 0 THEN -1L ELSE 1L END) *
           |        (abs(($lvl - element_at(acc, -1).level) +
           |          element_at(acc, -1).trend) div 2L))
           |    END))""".stripMargin))
    folded.select(groupCols.map(col) :+ explode(col("__series")).as("__p"): _*)
      .select(groupCols.map(col) ++ Seq(
        col("__p.x").as("x"), col("__p.y").as("y"),
        col("__p.level").as("level"), col("__p.trend").as("trend")): _*)
  }

  def ewmaIntSeries(
      df: DataFrame,
      groupCols: Seq[String],
      x: Column,
      y: Column,
      aNum: Long = 1L,
      aDen: Long = 4L): DataFrame = {
    require(aDen > 0 && aNum > 0 && aNum <= aDen,
      s"alpha must satisfy 0 < aNum/aDen <= 1, got $aNum/$aDen")
    val grid = df.select(
      groupCols.map(col) ++ Seq(
        x.cast("long").as("__x"), y.cast("long").as("__y")): _*)
      .filter(col("__x").isNotNull && col("__y").isNotNull)
      .groupBy(groupCols.map(col) :+ col("__x"): _*)
      .agg(sum(col("__y")).as("__y"))
    val folded = grid
      .groupBy(groupCols.map(col): _*)
      .agg(array_sort(collect_list(struct(
        col("__x").as("x"), col("__y").as("y")))).as("__grid"))
      .withColumn("__series", expr(
        s"""aggregate(__grid,
           |  cast(array() as array<struct<x: long, y: long, ewma: long>>),
           |  (acc, p) -> array_append(acc, named_struct('x', p.x, 'y', p.y,
           |    'ewma', CASE WHEN size(acc) = 0 THEN p.y
           |      ELSE (CASE WHEN ${aNum}L * p.y +
           |          ${aDen - aNum}L * element_at(acc, -1).ewma < 0
           |        THEN -1L ELSE 1L END) *
           |        (abs(${aNum}L * p.y +
           |          ${aDen - aNum}L * element_at(acc, -1).ewma) div ${aDen}L)
           |      END)))""".stripMargin))
    folded.select(groupCols.map(col) :+ explode(col("__series")).as("__p"): _*)
      .select(groupCols.map(col) ++ Seq(
        col("__p.x").as("x"), col("__p.y").as("y"),
        col("__p.ewma").as("ewma")): _*)
  }
}
