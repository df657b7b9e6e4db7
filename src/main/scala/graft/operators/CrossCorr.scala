package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lead–lag cross-covariance matrix between per-key daily series — the
  * "which metric moves first" read-out (do clicks lead purchases by two
  * days?) that turns a pile of per-day counts into causal-ordering
  * evidence. For every ordered key pair (a < b) and every lag
  * ℓ ∈ [−maxLag, maxLag], the UNNORMALIZED covariance numerator of a's
  * series against b's series shifted by ℓ:
  *
  *   `cov_num(a, b, ℓ) = m·Σ(yₐ·y_b₊ℓ) − Σyₐ·Σy_b₊ℓ`
  *
  * over the m = span − |ℓ| aligned grid days. Integer inputs stay exact
  * integers end to end: products accumulate in decimal(38,0), and the
  * returned `cov_num` is a long — exact while m·Σxy stays under 2⁶³
  * (a 10⁶-per-day series over a 10⁴-day span peaks near 10²⁰; pre-scale
  * y to coarser units for series hotter than that). The sign and
  * argmax-over-ℓ structure are what a consumer reads; dividing by the
  * constant variance normalizers would add no information the matrix
  * doesn't already carry.
  *
  * '''Grid convention.''' Series are densified to the GLOBAL [min, max]
  * day span with 0-fill (an absent day is zero activity, not missing
  * data), so every pair×lag cell aligns over the same m days and cells
  * are comparable across pairs.
  *
  * '''Plan shape (the 100-TB design).''' The corpus collapses to the
  * (key × day) grid in one map-side-combined aggregate; everything after
  * — densify, lag explode, self-join on the shifted day, final aggregate
  * — runs on the domain-bounded grid frame (keys · span · lags rows),
  * never on raw events. The self-join is an equi-join on the day column;
  * no window, no cross product. */
object CrossCorr {

  /** `df` is aggregated to (key, x, Σy) first; `xCol` must be an integral
    * day-like axis and `yCol` an integral measure. Returns one row per
    * (key_a < key_b, lag): `(key_a, key_b, lag, n_days, cov_num)`. */
  def leadLagMatrix(
      df: DataFrame, keyCol: String, xCol: Column, yCol: Column,
      maxLag: Int): DataFrame = {
    require(maxLag >= 0, "maxLag must be non-negative")
    val grid = df
      .groupBy(col(keyCol).as("__k"), xCol.cast("long").as("__x"))
      .agg(sum(yCol.cast("long")).as("__y"))
    val span = grid.agg(min("__x").as("__mn"), max("__x").as("__mx"))
    val keys = grid.select(col("__k")).distinct()
    val dense = keys.crossJoin(broadcast(span))
      .select(col("__k"), explode(expr("sequence(__mn, __mx)")).as("__x"))
      .join(grid, Seq("__k", "__x"), "left")
      .withColumn("__y", coalesce(col("__y"), lit(0L)))
    val a = dense.select(col("__k").as("key_a"), col("__x").as("__xa"),
      col("__y").as("__ya"))
      .crossJoin(broadcast(
        spark(df).range(-maxLag.toLong, maxLag + 1L).select(col("id").as("lag"))))
      .withColumn("__xb", col("__xa") + col("lag"))
    val b = dense.select(col("__k").as("key_b"), col("__x").as("__xb"),
      col("__y").as("__yb"))
    a.join(b, Seq("__xb"))
      .filter(col("key_a") < col("key_b"))
      .groupBy("key_a", "key_b", "lag")
      .agg(count(lit(1)).as("n_days"),
        sum(expr("cast(__ya as decimal(38,0)) * __yb")).as("__sxy"),
        sum("__ya").as("__sx"), sum("__yb").as("__sy"))
      .withColumn("cov_num", expr(
        "cast(n_days * __sxy - cast(__sx as decimal(38,0)) * __sy as bigint)"))
      .select("key_a", "key_b", "lag", "n_days", "cov_num")
  }

  private def spark(df: DataFrame) = df.sparkSession
}
