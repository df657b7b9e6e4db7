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

  /** Greedy cooldown throttle: per key (in `tsCol`, `tieCol` order) keep a
    * row iff at least `cooldown` time units have passed since the last
    * KEPT row — the retry-burst / notification-dedup policy. NOT
    * gap-sessionization: the anchor is the last kept row, so a steady
    * drizzle spaced under the cooldown collapses to one row per cooldown
    * window forever, where session-head keeping (whose anchor is the last
    * SEEN row) would keep only the first and then nothing until a full
    * gap opens. Returns the kept rows as (keyCols, `tieCol`, `tsCol`).
    *
    * The recurrence is inherently sequential per key (each decision
    * depends on the previous KEPT timestamp), so it folds over the key's
    * collected, sorted events with a single codegen'd higher-order
    * `aggregate` — one shuffle at key grain, no window, no UDF, no
    * iteration. Same bounded-per-key contract as [[sessionize]]: a key's
    * events fold executor-resident (user-grained keys at any realistic
    * fan-out); corpus-scale parallelism is across keys. The fold is
    * integer-exact and replays in SQL as a recursive CTE. */
  def throttle(df: DataFrame, keyCols: Seq[String], tsCol: String,
      tieCol: String, cooldown: Long): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(cooldown >= 0, s"cooldown must be non-negative, got $cooldown")
    val kept = df
      .groupBy(keyCols.map(col): _*)
      .agg(array_sort(collect_list(struct(
        col(tsCol).cast("long").as("ts"),
        col(tieCol).cast("long").as("tie")))).as("__evs"))
      // acc = (kept rows so far, last kept ts); NULL last = nothing kept yet
      .withColumn("__kept", expr(
        s"""aggregate(__evs,
           |  named_struct(
           |    'kept', cast(array() as array<struct<ts: long, tie: long>>),
           |    'last', cast(null as long)),
           |  (acc, x) -> CASE
           |    WHEN acc.last IS NULL OR x.ts - acc.last >= ${cooldown}L
           |      THEN named_struct(
           |        'kept', array_append(acc.kept, x), 'last', x.ts)
           |    ELSE acc END,
           |  acc -> acc.kept)""".stripMargin))
    kept.select(keyCols.map(col) :+ explode(col("__kept")).as("__e"): _*)
      .select(keyCols.map(col) :+ col("__e.tie").as(tieCol)
        :+ col("__e.ts").as(tsCol): _*)
  }
}
