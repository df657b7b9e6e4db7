package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Position-based (U-shaped) multi-touch attribution — the multi-touch
  * sibling of the last-touch credit the as-of join gives: every touch in
  * the conversion's lookback window earns a share of the conversion value,
  * weighted toward the FIRST touch (discovery) and the LAST touch
  * (closing), with the middle touches splitting the remainder. The
  * marketing-analytics standard "40/20/40" model, here in exact integer
  * micro-units so any engine replays it bit-for-bit.
  *
  * '''Credit convention (exact, value-conserving).''' With conversion
  * value `v` micro-units (non-negative) and `k` touches in the window,
  * credits in basis points `firstBp`/`lastBp`:
  *  - `k = 1`: the only touch takes `v` whole ("only" position).
  *  - `k = 2`: first takes `v div 2`, last takes `v − (v div 2)`.
  *  - `k ≥ 3`: first takes `(v·firstBp) div 10000`, each middle takes
  *    `(v − first − lastNominal) div (k−2)` with
  *    `lastNominal = (v·lastBp) div 10000`, and the last touch takes
  *    whatever remains: `v − first − middle·(k−2)` — closing credit
  *    absorbs every rounding remainder.
  *  Every branch sums to exactly `v`: Σcredit over a conversion's touches
  *  equals its value — the invariant the oracle checks, and the property
  *  float attribution can't give. All divisions are integer `div` on
  *  non-negative operands, so DuckDB's floor `//` replays them exactly.
  *
  * '''Plan shape (100 TB).''' Touches meet conversions through the binned
  * range join ([[RangeJoin.rangeJoin]] — equi on user + time-bin, never a
  * cross product), then ONE window partitioned by conversion id ranks the
  * window's touches (bounded by touches-per-user-per-window, the same
  * per-entity residency assumption as every window here). No corpus-grain
  * window, no per-position re-scan.
  */
object Attribution {

  /** Per-(conversion, touch) credit rows:
    * `(convIdCol, touchIdCol, k_touches, position, credit_micro)` with
    * `position ∈ {only, first, middle, last}`. Conversions with NO touch
    * in `(convTs − windowNs, convTs]` are absent (join is inner — route
    * them to an unattributed bucket with a left anti-join if needed).
    *
    * Column names across the two frames must be disjoint (the range-join
    * contract). `touchIdCol` must be unique per touch row (total order
    * within a window → deterministic positions). */
  def uShapedCredits(
      conversions: DataFrame,
      convIdCol: String,
      convUserCol: String,
      convTsCol: String,
      valueMicroCol: String,
      touches: DataFrame,
      touchIdCol: String,
      touchUserCol: String,
      touchTsCol: String,
      windowNs: Long,
      firstBp: Int = 4000,
      lastBp: Int = 4000): DataFrame = {
    require(windowNs > 0, "windowNs must be positive")
    require(firstBp >= 0 && lastBp >= 0 && firstBp + lastBp <= 10000,
      s"credit basis points must satisfy 0 <= firstBp + lastBp <= 10000, " +
        s"got $firstBp + $lastBp")
    // half-open (convTs − W, convTs]: shift by +1 so the range join's
    // [start, end) convention lands on "strictly after ts−W, up to ts";
    // negative values would break the div-based credit math loudly
    val v = when(col(valueMicroCol) < 0,
      raise_error(concat(lit("uShapedCredits: negative value_micro: "),
        col(valueMicroCol).cast("string"))))
      .otherwise(col(valueMicroCol)).cast("long")
    val intervals = conversions.select(
      col(convIdCol), col(convUserCol), v.as("__v"),
      (col(convTsCol).cast("long") - windowNs + 1L).as("__w_start"),
      (col(convTsCol).cast("long") + 1L).as("__w_end"))
    val joined = RangeJoin.rangeJoin(
      touches.select(col(touchIdCol), col(touchUserCol),
        col(touchTsCol).cast("long").as(touchTsCol)),
      touchTsCol, intervals, "__w_start", "__w_end",
      binWidth = windowNs, equiKeys = Seq(touchUserCol -> convUserCol))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(convIdCol))
    joined
      .withColumn("__pos", row_number().over(
        w.orderBy(col(touchTsCol), col(touchIdCol))))
      .withColumn("__k", count(lit(1)).over(w))
      .withColumn("position",
        when(col("__k") === 1, "only")
          .when(col("__pos") === 1, "first")
          .when(col("__pos") === col("__k"), "last")
          .otherwise("middle"))
      // integer `div` throughout (Spark `/` on longs is DOUBLE division)
      .withColumn("__first", expr(s"(__v * $firstBp) div 10000"))
      .withColumn("__lastNom", expr(s"(__v * $lastBp) div 10000"))
      // guarded: k<3 rows never use __mid, but ANSI mode would still
      // evaluate the div-by-zero at k=2 without the CASE
      .withColumn("__mid", expr(
        "CASE WHEN __k >= 3 THEN (__v - __first - __lastNom) div (__k - 2) " +
          "ELSE 0L END"))
      .withColumn("credit_micro",
        when(col("__k") === 1, col("__v"))
          .when(col("__k") === 2,
            when(col("position") === "first", expr("__v div 2"))
              .otherwise(col("__v") - expr("__v div 2")))
          .otherwise(
            when(col("position") === "first", col("__first"))
              .when(col("position") === "middle", col("__mid"))
              // last absorbs every rounding remainder: Σ = __v exactly
              .otherwise(col("__v") - col("__first") -
                col("__mid") * (col("__k") - 2))))
      .select(col(convIdCol), col(touchIdCol), col("__k").as("k_touches"),
        col("position"), col("credit_micro").cast("long").as("credit_micro"))
  }

  /** Time-decay multi-touch attribution: every touch in the lookback
    * window earns a share of the conversion value weighted by
    * `2^(maxAge − age)` where `age = (convTs − touchTs) div halfLifeNs`
    * and `maxAge = windowNs div halfLifeNs` — a touch one half-life older
    * earns exactly half the weight. Power-of-two weights keep the model
    * in pure integers (weights 1 … 2^maxAge; no `exp`/`pow` libm call),
    * and `maxAge` is bounded by the window/half-life ratio, so weights
    * can't overflow for any sane configuration (capped at 2⁶² loudly).
    *
    * '''Credit convention (exact, value-conserving).''' Each touch takes
    * `(v · w) div W` with `W = Σw` over the conversion's touches; the
    * MOST RECENT touch (largest ts, ties by largest touch id) then
    * absorbs the truncation remainder `v − Σfloor`, so Σcredit = v
    * exactly — same conservation invariant as [[uShapedCredits]], same
    * reason: closing credit owns the rounding.
    *
    * Same binned-range-join + one bounded window plan as
    * [[uShapedCredits]]. Returns
    * `(convIdCol, touchIdCol, k_touches, age_halflives, weight,
    * credit_micro)`. */
  def timeDecayCredits(
      conversions: DataFrame,
      convIdCol: String,
      convUserCol: String,
      convTsCol: String,
      valueMicroCol: String,
      touches: DataFrame,
      touchIdCol: String,
      touchUserCol: String,
      touchTsCol: String,
      windowNs: Long,
      halfLifeNs: Long): DataFrame = {
    require(windowNs > 0, "windowNs must be positive")
    require(halfLifeNs > 0, "halfLifeNs must be positive")
    val maxAge = windowNs / halfLifeNs
    require(maxAge <= 62, s"windowNs/halfLifeNs = $maxAge half-lives " +
      "would overflow 2^62 integer weights; coarsen halfLifeNs")
    val v = when(col(valueMicroCol) < 0,
      raise_error(concat(lit("timeDecayCredits: negative value_micro: "),
        col(valueMicroCol).cast("string"))))
      .otherwise(col(valueMicroCol)).cast("long")
    val intervals = conversions.select(
      col(convIdCol), col(convUserCol), v.as("__v"),
      col(convTsCol).cast("long").as("__cts"),
      (col(convTsCol).cast("long") - windowNs + 1L).as("__w_start"),
      (col(convTsCol).cast("long") + 1L).as("__w_end"))
    val joined = RangeJoin.rangeJoin(
      touches.select(col(touchIdCol), col(touchUserCol),
        col(touchTsCol).cast("long").as(touchTsCol)),
      touchTsCol, intervals, "__w_start", "__w_end",
      binWidth = windowNs, equiKeys = Seq(touchUserCol -> convUserCol))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(convIdCol))
    joined
      .withColumn("age_halflives",
        expr(s"(__cts - $touchTsCol) div $halfLifeNs"))
      .withColumn("weight",
        expr(s"shiftleft(1L, cast($maxAge - age_halflives as int))"))
      .withColumn("__k", count(lit(1)).over(w))
      .withColumn("__sw", sum(col("weight")).over(w))
      // decimal(38,0) product: v·w reaches 10¹² · 2^62 for aggressive
      // half-life configs — past a long, never past 38 digits
      .withColumn("__floor", expr(
        "cast((cast(__v as decimal(38,0)) * weight) div __sw as bigint)"))
      .withColumn("__sfloor", sum(col("__floor")).over(w))
      // most-recent touch (max ts, ties by max id) absorbs the remainder
      .withColumn("__rank", row_number().over(
        w.orderBy(col(touchTsCol).desc, col(touchIdCol).desc)))
      .withColumn("credit_micro",
        when(col("__rank") === 1, col("__floor") + (col("__v") - col("__sfloor")))
          .otherwise(col("__floor")))
      .select(col(convIdCol), col(touchIdCol), col("__k").as("k_touches"),
        col("age_halflives"), col("weight"),
        col("credit_micro").cast("long").as("credit_micro"))
  }
}
