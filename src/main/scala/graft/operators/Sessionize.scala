package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch gap-based sessionization: the batch face of
  * [[graft.streaming.StreamOps.sessionCounts]]'s `session_window` (same
  * session semantics — a gap of more than `gapNs` between consecutive
  * events starts a new session).
  *
  * Scale design: one shuffle, partitioned by the key columns; both window
  * passes (the lag and the running session counter) share that single
  * partitioning, so Spark plans ONE Exchange + ONE Sort for the whole
  * operator. Per-key event streams are assumed executor-resident (true for
  * user-grained keys at any realistic fan-out; a single key with billions
  * of events would need range-chunked sessionization instead).
  */
object Sessionize {

  /** Adds `session_id` (1-based, per key, in `tsCol`/`tieCol` order). Rows
    * with equal keys and a time gap ≤ `gap` (in `tsCol`'s units) share a
    * session id. */
  def sessionize(df: DataFrame, keyCols: Seq[String], tsCol: String,
      tieCol: String, gap: Long): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(gap >= 0, s"gap must be non-negative, got $gap")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
    val newSession =
      when(lag(col(tsCol), 1).over(w).isNull, 1L)
        .when(col(tsCol) - lag(col(tsCol), 1).over(w) > gap, 1L)
        .otherwise(0L)
    df.withColumn("__graft_new_session", newSession)
      .withColumn("session_id",
        sum("__graft_new_session").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__graft_new_session")
  }

  /** Per-session rollup: (keyCols, session_id, n_events, start_ts, end_ts). */
  def sessionStats(df: DataFrame, keyCols: Seq[String], tsCol: String,
      tieCol: String, gap: Long): DataFrame =
    sessionize(df, keyCols, tsCol, tieCol, gap)
      .groupBy((keyCols :+ "session_id").map(col): _*)
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("start_ts"), max(col(tsCol)).as("end_ts"))
}
