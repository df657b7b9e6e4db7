package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact Pearson correlation matrix over integral metric columns — the
  * "which signals move together" triage run before feature selection or
  * drift attribution, without `stat.corr`'s driver-side double matrix or
  * any FP accumulation order-dependence.
  *
  * '''Exactness.''' All inputs must be integral longs (cents, pct-points,
  * counts — the caller scales). One corpus pass accumulates n, Σx, Σx²,
  * and Σxy per pair as decimal(38,0); the pair frame is exploded from the
  * single moment row. `r²` is reported in ppm by the two-step integral
  * division `(|cov|·10³ div vx) · (|cov|·10³ div vy)` where
  * `cov = n·Σxy − Σx·Σy`, `vx = n·Σx² − (Σx)²` — no sqrt, no doubles, so
  * any SQL engine replays it bit-for-bit. The sign travels separately
  * (`corr_sign` ∈ {-1,0,1}). Exact while `n·Σxy < 10³⁵` — ≈10⁹ rows at
  * cent scales; beyond that pre-aggregate per shard and sum moments
  * (they're additive).
  *
  * '''Plan shape (100 TB).''' One scan → one partial+final aggregate of
  * `1 + 2k + k(k−1)/2` columns → a 1-row frame; the explode and the ppm
  * arithmetic are pair-grain (k² rows). No shuffle beyond the single
  * aggregate exchange, no window, no collect. */
object Correlation {

  /** One row per unordered metric pair: `metric_a`, `metric_b`, `n_rows`,
    * `corr_sign`, `r2_ppm` (NULL when either variance is zero). */
  def corrMatrixExact(df: DataFrame, metricCols: Seq[String]): DataFrame = {
    require(metricCols.size >= 2, "need at least two metric columns")
    require(metricCols.distinct.size == metricCols.size,
      "metric columns must be distinct")
    val names = metricCols
    // a NULL in any metric would desync n from that metric's sums
    // (sum skips NULLs, count(1) doesn't) — complete rows only
    val rows = df.na.drop(names)
    // decimal BEFORE the multiply (the Trend.scala:48-58 rule): a
    // long×long product overflows at |x| > ~3·10⁹ — far inside the
    // documented exactness envelope — wrapping silently (or throwing
    // under ANSI) while the decimal product just widens
    def d(c: String) = col(c).cast("decimal(38,0)")
    val aggs =
      Seq(count(lit(1)).cast("decimal(38,0)").as("__n")) ++
      names.map(c => sum(d(c)).as(s"__s_$c")) ++
      names.map(c => sum(d(c) * d(c)).as(s"__ss_$c")) ++
      (for { i <- names.indices; j <- names.indices if i < j } yield
        sum(d(names(i)) * d(names(j)))
          .as(s"__sp_${names(i)}_${names(j)}"))
    val one = rows.agg(aggs.head, aggs.tail: _*)
    val pairStructs = for {
      i <- names.indices; j <- names.indices if i < j
      a = names(i); b = names(j)
    } yield struct(
      lit(a).as("metric_a"), lit(b).as("metric_b"),
      (col("__n") * col(s"__sp_${a}_$b") - col(s"__s_$a") * col(s"__s_$b"))
        .as("cov"),
      (col("__n") * col(s"__ss_$a") - col(s"__s_$a") * col(s"__s_$a"))
        .as("vx"),
      (col("__n") * col(s"__ss_$b") - col(s"__s_$b") * col(s"__s_$b"))
        .as("vy"))
    one.select(col("__n"), explode(array(pairStructs: _*)).as("p"))
      .select(
        col("p.metric_a").as("metric_a"), col("p.metric_b").as("metric_b"),
        col("__n").cast("long").as("n_rows"),
        expr("cast(case when p.cov < 0 then -1 when p.cov > 0 then 1" +
          " else 0 end as bigint)").as("corr_sign"),
        expr("cast(case when p.vx = 0 or p.vy = 0 then null else" +
          " (abs(p.cov) * 1000 div p.vx) * (abs(p.cov) * 1000 div p.vy)" +
          " end as bigint)").as("r2_ppm"))
  }

  /** Exact Spearman rank correlation between two columns — the monotone
    * association Pearson misses (a perfectly monotone but nonlinear
    * relation scores ρ² = 1 here), robust to outlier magnitudes because
    * only ranks enter the moments.
    *
    * Ranks are dense row numbers with ties broken by `idCol` (the
    * deterministic-total-order convention every ranked operator here
    * uses — NOT average-rank Spearman; on continuous data the two agree,
    * and the convention is what makes the result SQL-replayable
    * bit-for-bit). Both rankings come from
    * [[GroupedRank.withGroupRank]] with EMPTY groups — range-partitioned,
    * no single-task sort — then the rank pair feeds [[corrMatrixExact]]'s
    * integral moment math. Output: one row `(metric_a, metric_b, n_rows,
    * corr_sign, r2_ppm)` where r2_ppm is ρ²·10⁶. */
  def spearmanExact(
      df: DataFrame,
      xCol: String,
      yCol: String,
      idCol: String): DataFrame = {
    // same complete-rows contract as corrMatrixExact: a NULL metric has
    // no rank (row_number would otherwise rank NULLs first and feed a
    // meaningless position into the moments) — drop before ranking so
    // the operator and its oracle replay share one row set
    val rows = df.select(col(xCol), col(yCol), col(idCol))
      .na.drop(Seq(xCol, yCol))
    val rx = GroupedRank.withGroupRank(
      rows, Seq.empty, Seq(col(xCol), col(idCol)), s"rank_$xCol")
    val rxy = GroupedRank.withGroupRank(
      rx, Seq.empty, Seq(col(yCol), col(idCol)), s"rank_$yCol")
    corrMatrixExact(rxy.select(col(s"rank_$xCol"), col(s"rank_$yCol")),
      Seq(s"rank_$xCol", s"rank_$yCol"))
  }
}
