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
}
