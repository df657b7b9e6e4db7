package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval coalescing ("flatten"): merge each key's overlapping or
  * touching intervals into maximal disjoint spans — the union-of-intervals
  * primitive behind availability windows, coverage accounting, and
  * session-span rollups. Completes the interval family: [[AsofJoin]] and
  * [[RangeJoin]] JOIN against intervals; this NORMALIZES them first (a
  * pre-coalesce pass also bounds the fan-out of a subsequent
  * interval-overlap join — merged inputs can't multiply matches).
  *
  * Algorithm: the classic sweep — order each key's intervals by start, a
  * new span begins where `start` exceeds the running max of all previous
  * ends. Both window passes (the running max and the span counter) share
  * ONE partitioning, so Spark plans a single Exchange + Sort for the whole
  * operator; the rollup aggregate is map-side combined. Per-key streams
  * are assumed executor-resident (the repo-wide window assumption).
  *
  * Touching intervals (`start == prev_end`) MERGE — [a,b) ∪ [b,c) has no
  * gap. All comparisons are on the caller's (integer) time columns, so the
  * result is bit-exact across engines.
  */
object Intervals {

  /** Maximal disjoint spans per key: (keyCols..., span_start, span_end,
    * n_merged).
    *
    * @param tieCol unique per-row tiebreaker making the per-key sweep order
    *               total when starts collide. */
  def coalesceIntervals(df: DataFrame, keyCols: Seq[String],
      startCol: String, endCol: String, tieCol: String): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(startCol), col(tieCol))
    val prevMaxEnd = max(col(endCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val newSpan =
      when(prevMaxEnd.isNull || col(startCol) > prevMaxEnd, 1L).otherwise(0L)
    df.withColumn("__graft_new_span", newSpan)
      .withColumn("__graft_span",
        sum("__graft_new_span").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy((keyCols :+ "__graft_span").map(col): _*)
      .agg(min(col(startCol)).as("span_start"),
        max(col(endCol)).as("span_end"),
        count(lit(1)).as("n_merged"))
      .select(keyCols.map(col) ++
        Seq(col("span_start"), col("span_end"), col("n_merged")): _*)
  }
}
