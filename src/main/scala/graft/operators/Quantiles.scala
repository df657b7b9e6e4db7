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
}
