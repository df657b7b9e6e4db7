package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact per-group order-statistic quantiles: for each group and each
  * requested fraction `q`, the `ceil(q·n)`-th smallest value (1-indexed; the
  * "lower discrete quantile"). Median/p90/p99 profiling of value
  * distributions per key.
  *
  * An ORDER STATISTIC, not an interpolated quantile: the result is an actual
  * element of the group, chosen purely by rank — no floating-point
  * arithmetic between neighbors — so the result is bit-identical across
  * engines and exactly oracle-checkable (interpolating quantiles differ in
  * the last ulp between implementations; `approx_percentile` isn't
  * deterministic across partitionings at all).
  *
  * '''Plan shape.''' Ranks come from [[GroupedRank.withGroupRank]] — the
  * range-partitioned distributed rank, NOT a per-group window (which
  * co-locates and sorts each group in one task; with a handful of large
  * groups that is the 100-TB scale-killer). Ranks computed under value
  * ties are any valid `row_number` assignment, which cannot change an
  * order statistic: the rank-r VALUE of a multiset is tie-order
  * independent. Group totals come from a map-side-combined aggregate
  * joined back (no broadcast hint — group count is unbounded in this
  * operator's contract, and AQE picks a broadcast when the totals frame
  * turns out small). Then a rank-predicate filter and a pivot-style
  * conditional aggregation back to one row per group.
  */
object Quantiles {

  def groupQuantiles(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      fractions: Seq[Double]): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(f => f > 0 && f <= 1),
      "fractions must be in (0, 1]")
    val filtered = df.filter(col(valueCol).isNotNull)
    val totals = filtered.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__graft_n"))
    // NULL-SAFE group equality on the totals join: groupBy (and the rank
    // join inside GroupedRank) treat NULL as an ordinary group, so a plain
    // using-join here would silently drop every NULL-group row
    val totR = groupCols.foldLeft(totals) { (d, c) =>
      d.withColumnRenamed(c, s"__graft_q_$c")
    }
    val rankedOnly =
      GroupedRank.withGroupRank(filtered, groupCols, Seq(col(valueCol)), "__graft_rn")
    val ranked = (
      if (groupCols.isEmpty) rankedOnly.crossJoin(totR)
      else rankedOnly.join(totR,
        groupCols.map(c => col(c) <=> col(s"__graft_q_$c")).reduce(_ && _))
    ).drop(groupCols.map(c => s"__graft_q_$c"): _*)
    // column names derive from the exact decimal fraction (p50, p99_5), not a
    // rounded percent — 0.995 and 1.0 must not both become "p100"
    val names = fractions.map(quantileName)
    require(names.distinct.size == names.size,
      s"fractions map to duplicate column names: ${names.mkString(", ")}")
    val aggs = fractions.zip(names).map { case (f, name) =>
      val target = greatest(lit(1L), ceil(col("__graft_n") * f))
      max(when(col("__graft_rn") === target, col(valueCol))).as(name)
    } :+ max(col("__graft_n")).as("n")
    ranked.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** "p" + percent with the exact decimal tail, '.' → '_' (0.5 → p50,
    * 0.995 → p99_5, 0.251 → p25_1). BigDecimal over the fraction's decimal
    * rendering so 0.995·100 is exactly 99.5, not 99.49999…. */
  private[graft] def quantileName(f: Double): String = {
    val pct = (BigDecimal(f.toString) * 100).underlying.stripTrailingZeros
    "p" + pct.toPlainString.replace(".", "_")
  }

  /** APPROXIMATE per-group quantiles from a fixed-width histogram: for
    * each fraction `q`, the LOWER EDGE of the first bin whose cumulative
    * count reaches `ceil(q·n)` — the answer is within `binWidth` below
    * the exact order statistic, and that error bound is the whole
    * contract.
    *
    * The bounded-state face of [[groupQuantiles]]: the exact operator
    * ranks every row (a full shuffle of the table); this one aggregates
    * to (group, bin) grain first — map-side combined, so the exchange
    * ships `#groups × #occupied-bins` counter rows however large the
    * table — and the quantile read-off runs on bin-grain data. The same
    * sufficient-statistics trade as [[graft.sketch.KmvOps]]: when a
    * `binWidth`-accurate answer is acceptable, the full-table shuffle is
    * pure waste at 100 TB. Histogram counts are also re-aggregatable
    * (persist per-day (group, bin) counts, roll up any period by
    * addition).
    *
    * Deterministic and engine-exact: bins are `floor(value / binWidth)`
    * (one IEEE division), edges are `bin · binWidth` (exact for modest
    * integer bins × a representable width), counts are integers. NULL
    * values are excluded, matching [[groupQuantiles]]. */
  def binnedQuantiles(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      binWidth: Double,
      fractions: Seq[Double]): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(fractions.nonEmpty && fractions.forall(f => f > 0 && f <= 1),
      "fractions must be in (0, 1]")
    val names = fractions.map(quantileName)
    require(names.distinct.size == names.size,
      s"fractions map to duplicate column names: ${names.mkString(", ")}")
    val hist = df.filter(col(valueCol).isNotNull)
      .groupBy(groupCols.map(col) :+
        floor(col(valueCol) / binWidth).cast("long").as("__graft_bin"): _*)
      .agg(count(lit(1)).as("__graft_c"))
    // cumulative count over bins within each group: bin-grain rows only
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(col("__graft_bin"))
    val cum = hist
      .withColumn("__graft_cum", sum("__graft_c").over(w))
      .withColumn("__graft_n",
        sum("__graft_c").over(org.apache.spark.sql.expressions.Window
          .partitionBy(groupCols.map(col): _*)))
    // first bin reaching the target rank, per fraction; min() picks it
    // without a second ordering pass
    val aggs = fractions.zip(names).map { case (f, name) =>
      val target = greatest(lit(1L), ceil(col("__graft_n") * f))
      (min(when(col("__graft_cum") >= target, col("__graft_bin")))
        .cast("double") * binWidth).as(name)
    } :+ max(col("__graft_n")).as("n")
    cum.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
