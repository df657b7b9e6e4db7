package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust per-group outlier detection: median / MAD
  * (median-absolute-deviation) z-scores. Mean/stddev outlier rules break on
  * exactly the data they're meant to find — a handful of giant documents
  * drags the mean toward themselves — so corpus-quality pipelines flag on
  * `|x − median| > t·MAD` instead (the standard robust filter for
  * document-length / field-size anomalies).
  *
  * '''All-integer order statistics.''' Both medians are the house "lower
  * discrete quantile" order statistic ([[Quantiles.groupQuantiles]]):
  * actual elements of the group, never interpolated — so for integer
  * inputs the whole rule (`|x − med| > t·mad`) is exact long arithmetic,
  * bit-identical across engines and partitionings. (Interpolating medians
  * differ in the last ulp between implementations; approx sketches aren't
  * deterministic at all.)
  *
  * '''Plan shape (100-TB).''' Two [[Quantiles.groupQuantiles]] passes (the
  * median, then the median of deviations), each a range-partitioned
  * [[GroupedRank]] — no per-group single-task window sort when one group
  * holds most of the corpus. The per-group stats frames are #groups rows;
  * the joins back are null-safe on the group key (NULL is an ordinary
  * group) and AQE broadcasts them when small.
  */
object RobustStats {

  /** `df` plus `medCol` / `madCol` / `devCol`: each row tagged with its
    * group's median, MAD, and its own absolute deviation. `valueCol` must
    * be integral (the exactness contract above). */
  def withRobustStats(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      medCol: String = "med",
      madCol: String = "mad",
      devCol: String = "dev"): DataFrame = {
    def joinBack(rows: DataFrame, stats: DataFrame, statCol: String,
        outCol: String): DataFrame = {
      val renamed = groupCols.foldLeft(
          stats.select(groupCols.map(col) :+ col(statCol).as(outCol): _*)) {
        (d, c) => d.withColumnRenamed(c, s"__graft_r_$c")
      }
      if (groupCols.isEmpty) rows.crossJoin(broadcast(renamed))
      else rows.join(renamed,
        groupCols.map(c => col(c) <=> col(s"__graft_r_$c")).reduce(_ && _))
        .drop(groupCols.map(c => s"__graft_r_$c"): _*)
    }
    val meds = Quantiles.groupQuantiles(df, groupCols, valueCol, Seq(0.5))
    val withMed = joinBack(df, meds, "p50", medCol)
      .withColumn(devCol, abs(col(valueCol) - col(medCol)))
    val mads = Quantiles.groupQuantiles(withMed, groupCols, devCol, Seq(0.5))
    joinBack(withMed, mads, "p50", madCol)
  }

  /** The rows flagged as outliers: `|x − med| > threshold·MAD`, exact
    * integer comparison. A zero-MAD group (over half its values at the
    * median) flags every value off the median — the conventional
    * degenerate-MAD behavior, and the right one for "this field should be
    * constant" checks. */
  def outliers(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      threshold: Long = 3L): DataFrame = {
    require(threshold >= 0, "threshold must be non-negative")
    withRobustStats(df, groupCols, valueCol)
      .filter(col("dev") > lit(threshold) * col("mad"))
  }

  /** Per-group GINI concentration index over a non-negative integer
    * `valueCol` — the "is one source's token mass dominated by a few huge
    * documents?" balance audit a corpus report runs per source/language.
    *
    * Exact integer arithmetic throughout: with values ranked ascending
    * (ties by `tieBreakCol` for a deterministic rank — the Gini SUM is
    * tie-order invariant, the determinism is for free), the numerator is
    * `G = 2·Σ(rank·x) − (n+1)·Σx` and `gini_ppm = G·10⁶ div (n·Σx)`
    * (0 = perfectly equal, →10⁶ as one row holds everything). The Σ(rank·x)
    * partials and G stay in int64 (envelope ~10⁹ rows × ~10⁹ total value
    * per group); the final `·10⁶ / (n·Σx)` step — which would wrap int64
    * already near n·Σx ≈ 9.2e12 — is computed in DECIMAL(38,0), so the
    * ppm is exact across the full documented envelope instead of silently
    * wrapping three orders of magnitude before it.
    *
    * '''Plan shape.''' One [[GroupedRank]] pass (range partition — no
    * per-group single-task sort) + one map-side-combined aggregate. */
  def giniIndex(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      tieBreakCol: String): DataFrame = {
    val ranked = GroupedRank.withGroupRank(
      df.filter(col(valueCol).isNotNull && col(valueCol) >= 0),
      groupCols, Seq(col(valueCol), col(tieBreakCol)), "__graft_gr")
    ranked.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol)).as("sum_value"),
        sum(col("__graft_gr") * col(valueCol)).as("__graft_rx"))
      .withColumn("gini_num",
        lit(2L) * col("__graft_rx") - (col("n") + 1L) * col("sum_value"))
      .withColumn("gini_ppm",
        // decimal(38,0) for the ×10⁶ product and n·Σx denominator: both
        // overflow int64 well inside the documented envelope (gini_num is
        // itself O(n·Σx)); `div` on decimals still yields a LongType ppm.
        when(col("sum_value") === 0, lit(0L))
          .otherwise(expr(
            "(cast(gini_num as decimal(38,0)) * 1000000) div " +
              "(cast(n as decimal(38,0)) * cast(sum_value as decimal(38,0)))")))
      .drop("__graft_rx")
  }

  /** Benford's-law ppm expectations for first digits 1..9:
    * `round(log10(1 + 1/d) × 10⁶)` — inlined as integer literals so both
    * engines compare against the identical table. */
  private[graft] val BenfordPpm: Seq[(String, Long)] = Seq(
    "1" -> 301030L, "2" -> 176091L, "3" -> 124939L, "4" -> 96910L,
    "5" -> 79181L, "6" -> 66947L, "7" -> 57992L, "8" -> 51153L, "9" -> 45757L)

  /** First-significant-digit census of a positive numeric column vs
    * Benford's law — the classic forensic screen for fabricated or
    * truncated value distributions (amounts, counts, sizes). Rows with
    * `value < 1` or NULL are excluded (no leading significant digit).
    *
    * Digit extraction is `substr(string(bigint(floor(v))), 1, 1)` — floor
    * BEFORE the integer cast, because engines disagree on double→int cast
    * rounding (truncate vs round-half-even), and integer→string rendering
    * is identical everywhere; no float log10 near power-of-ten edges.
    * Output per digit: `n`, `observed_ppm`, `benford_ppm`, `dev_ppm`
    * (absolute). One aggregate at 9-key grain plus a broadcast of the
    * 1-row total — nothing scales with the data but the scan.
    */
  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    val digits = df
      .filter(col(valueCol).isNotNull && col(valueCol) >= 1)
      .select(substring(floor(col(valueCol)).cast("long").cast("string"), 1, 1)
        .as("digit"))
    val counts = digits.groupBy("digit").agg(count(lit(1)).as("n"))
    val total = counts.agg(sum("n").as("__total"))
    val expected = typedLit(BenfordPpm.toMap)
    counts.crossJoin(broadcast(total))
      .withColumn("observed_ppm", expr("(n * 1000000) DIV __total"))
      .withColumn("benford_ppm", element_at(expected, col("digit")))
      .select(col("digit"), col("n"), col("observed_ppm"), col("benford_ppm"),
        abs(col("observed_ppm") - col("benford_ppm")).as("dev_ppm"))
  }

  /** Per-group winsorized statistics: values clamped to the group's exact
    * [p10, p90] order statistics (the house lower-discrete-quantile rule —
    * actual elements, never interpolated, so the whole rule is exact long
    * arithmetic), then one aggregate. The robust mean for metric columns
    * whose tails are exactly the rows you distrust — winsorizing keeps the
    * tail rows (unlike trimming) but caps their leverage.
    *
    * Output per group: `n`, the clamp bounds `p10`/`p90`, `n_lo`/`n_hi`
    * (rows clamped from below/above) and `wins_mean_ppm` — the winsorized
    * mean in exact micro-units (`Σclamped·10⁶ div n`, decimal(38,0)).
    *
    * '''Plan shape (100 TB).''' [[Quantiles.groupQuantiles]] (range-
    * partitioned GroupedRank, no per-group sort task) produces a #groups-
    * row bounds frame; the clamp+aggregate pass joins it back broadcast.
    * Two corpus passes total — the unavoidable minimum for an exact
    * order-statistic bound (sketch bounds would be one pass, but then the
    * clamp is approximate and engine-dependent). */
  def winsorizedStats(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String): DataFrame = {
    val bounds = Quantiles.groupQuantiles(
      df, groupCols, valueCol, Seq(0.1, 0.9))
      .select(groupCols.map(col) :+ col("p10") :+ col("p90"): _*)
    val bndR = groupCols.foldLeft(bounds) { (d, c) =>
      d.withColumnRenamed(c, s"__graft_w_$c")
    }
    val joined = df.filter(col(valueCol).isNotNull)
      .join(broadcast(bndR),
        groupCols.map(c => col(c) <=> col(s"__graft_w_$c")).reduce(_ && _))
      .withColumn("__graft_wv",
        least(greatest(col(valueCol), col("p10")), col("p90")))
    joined.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        first("p10").as("p10"), first("p90").as("p90"),
        sum(when(col(valueCol) < col("p10"), 1L).otherwise(0L)).as("n_lo"),
        sum(when(col(valueCol) > col("p90"), 1L).otherwise(0L)).as("n_hi"),
        sum(col("__graft_wv").cast("decimal(38,0)")).as("__graft_ws"))
      .withColumn("wins_mean_ppm",
        // Sign-split so Spark's truncating `div` matches DuckDB's floor
        // `//` on negative winsorized sums too (they agree only on ≥0).
        expr("case when __graft_ws < 0 then -1 else 1 end" +
          " * ((abs(__graft_ws) * 1000000) div cast(n as decimal(38,0)))"))
      .select(groupCols.map(col) ++ Seq(col("n"), col("p10"), col("p90"),
        col("n_lo"), col("n_hi"), col("wins_mean_ppm")): _*)
  }

  /** Pairwise two-sample Kolmogorov–Smirnov distance between every pair of
    * groups over an integral value column, in exact integer ppm — the
    * distribution-shift screen ("did src7's length distribution drift away
    * from the rest?") that mean/stddev comparisons miss entirely.
    *
    * `D = max_v |F_a(v) − F_b(v)|` evaluated at every distinct value, as
    * the exact rational `max |cumA·n_b − cumB·n_a| / (n_a·n_b)`, reported
    * `ks_ppm = (max_num · 10⁶) div (n_a·n_b)` — all cross-terms in
    * decimal(38,0) (`cum·n` overflows int64 past ~3·10⁹ rows per side).
    *
    * '''Plan shape (100 TB).''' ONE `groupBy (group, value)` count pass
    * over the corpus — the only stage that scales with the data, and it
    * appears exactly once in the lineage (the naive self-join formulation
    * computes the corpus aggregate once per ECDF leg). ECDFs live on the
    * `#groups × #distinct-values` grid (domain-bounded, NOT
    * corpus-bounded: document lengths, scores, durations have bounded
    * domains), built by cross-joining the broadcast group list with the
    * distinct values; the cumulative count AND the group total ride the
    * same window pass partitioned BY GROUP — each window partition is one
    * ECDF of domain-size rows, never a single global sort. Pairs come
    * from a per-value `collect_list` + double explode (`#groups²` rows
    * per value, all grid-sized), not a self-join — no second lineage.
    * `#groups` must be small (sources, shards — it's a pairwise audit;
    * p groups emit p(p−1)/2 rows).
    */
  def ksPairwise(
      df: DataFrame,
      groupCol: String,
      valueCol: String): DataFrame = {
    // localCheckpoint the (group, value)-grain counts: THREE legs read it
    // (groups, values, the cum join) and column pruning differentiates
    // their aggregate subtrees, so ReusedExchange cannot collapse them —
    // without the checkpoint the corpus count pass would run three times.
    // The frame is domain-bounded (never corpus-sized), which is exactly
    // when materializing is the right trade (contrast GroupedRank's doc).
    val counts = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).as("__g"), col(valueCol).cast("long").as("__v"))
      .groupBy("__g", "__v").agg(count(lit(1)).as("__c"))
      .localCheckpoint()
    val groups = counts.select("__g").distinct()
    val values = counts.select("__v").distinct()
    // grid fill: every group needs a cum value AT every distinct value of
    // any group, else the max-gap scan misses steps the other side took
    val W = org.apache.spark.sql.expressions.Window
    val wg = W.partitionBy("__g").orderBy("__v")
    val cum = values.crossJoin(broadcast(groups))
      .join(counts, Seq("__g", "__v"), "left")
      .withColumn("__cum", sum(coalesce(col("__c"), lit(0L)))
        .over(wg.rowsBetween(W.unboundedPreceding, W.currentRow)))
      .withColumn("__n", sum(coalesce(col("__c"), lit(0L)))
        .over(wg.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)))
    cum.groupBy("__v")
      .agg(collect_list(struct(col("__g"), col("__cum"), col("__n"))).as("__gs"))
      .select(explode(col("__gs")).as("__a"), col("__gs"))
      .select(col("__a"), explode(col("__gs")).as("__b"))
      .filter(col("__a.__g") < col("__b.__g"))
      .groupBy(col("__a.__g").as("src_a"), col("__b.__g").as("src_b"))
      .agg(first(col("__a.__n")).as("n_a"), first(col("__b.__n")).as("n_b"),
        max(abs(expr("cast(__a.__cum as decimal(38,0)) * __b.__n") -
          expr("cast(__b.__cum as decimal(38,0)) * __a.__n"))).as("__maxnum"))
      .withColumn("ks_ppm", expr(
        "(__maxnum * 1000000) div (cast(n_a as decimal(38,0)) * n_b)"))
      .select("src_a", "src_b", "n_a", "n_b", "ks_ppm")
  }
}
