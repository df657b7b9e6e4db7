package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sessionize
import graft.testkit.DatasetComparisons._

class SessionizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("gaps strictly beyond the threshold split sessions; ties and equal gaps don't") {
    import spark.implicits._
    val df = Seq(
      // user 1: 0, 5, 10 (gap 5 ok) | 100 (gap 90 splits) | 105
      (1L, 1L, 0L), (1L, 2L, 5L), (1L, 3L, 10L), (1L, 4L, 100L), (1L, 5L, 105L),
      // user 2: single event
      (2L, 6L, 7L),
      // user 3: gap EXACTLY the threshold stays one session
      (3L, 7L, 0L), (3L, 8L, 10L)
    ).toDF("user_id", "event_id", "ts_ns")
    val out = Sessionize.sessionize(df, Seq("user_id"), "ts_ns", "event_id", gap = 10L)
      .select("user_id", "event_id", "session_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      (1L, 1L) -> 1L, (1L, 2L) -> 1L, (1L, 3L) -> 1L,
      (1L, 4L) -> 2L, (1L, 5L) -> 2L,
      (2L, 6L) -> 1L,
      (3L, 7L) -> 1L, (3L, 8L) -> 1L), s"got $out")
  }

  test("batch sessionization agrees with streaming session_window counts") {
    import graft.streaming.StreamOps
    // session_window works on µs-truncated timestamps and splits at
    // gap-or-more; sessionize splits strictly-beyond, so pass gap-1 µs
    val batch = Sessionize.sessionStats(
      graft.sources.EventTime.withTsNs(
        spark.read.parquet(s"$sf/events.parquet"))
        .select(col("user_id"), col("event_id"),
          expr("ts_ns DIV 1000").as("ts_us")),
      Seq("user_id"), "ts_us", "event_id", gap = 30L * 60 * 1000 * 1000 - 1)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
    val streamed = StreamOps.runToMemory(spark,
      StreamOps.sessionCounts(StreamOps.eventsStream(spark, s"$sf/events.parquet")),
      "t_sessionize_stream")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
    batch.ensureDatasetEquals(streamed)
  }

  test("plan shares one exchange across both window passes and the rollup") {
    import spark.implicits._
    val df = Seq((1L, 1L, 0L)).toDF("user_id", "event_id", "ts_ns")
    val q = Sessionize.sessionStats(df, Seq("user_id"), "ts_ns", "event_id", 10L)
    val p = q.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges in:\n$p")
  }

  test("throttle keeps rows anchored to the last KEPT row, not the last seen") {
    import spark.implicits._
    // ts 0,5,9,14,20 cooldown 10: greedy keeps 0 (anchor 0), drops 5 and 9,
    // keeps 14 (14-0 ≥ 10, anchor 14), drops 20 (20-14 < 10). Gap-10
    // SESSIONIZATION of the same rows is one session (all gaps ≤ 10) —
    // its head-keeping would keep only ts 0; the extra kept row at 14 is
    // exactly the kept-anchored/seen-anchored semantic difference.
    val df = Seq((7L, 1L, 0L), (7L, 2L, 5L), (7L, 3L, 9L), (7L, 4L, 14L),
      (7L, 5L, 20L)).toDF("k", "id", "ts")
    val kept = graft.operators.Sessionize
      .throttle(df, Seq("k"), "ts", "id", cooldown = 10L)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(kept == Set((1L, 0L), (4L, 14L)))
    val sessions = graft.operators.Sessionize
      .sessionize(df, Seq("k"), "ts", "id", gap = 10L)
      .select("session_id").distinct().count()
    assert(sessions == 1L)
  }

  test("throttle: exact-cooldown boundary keeps, ties break by the tie column") {
    import spark.implicits._
    // two rows at ts 0 (ids 9 and 2): the fold sorts (ts, id) so id 2 is
    // first and is kept, id 9 lands inside its cooldown; ts 10 keeps
    // (boundary is >=), ts 19 drops
    val df = Seq((1L, 9L, 0L), (1L, 2L, 0L), (1L, 3L, 10L), (1L, 4L, 19L))
      .toDF("k", "id", "ts")
    val kept = graft.operators.Sessionize
      .throttle(df, Seq("k"), "ts", "id", cooldown = 10L)
      .collect().map(r => r.getLong(1)).toSet
    assert(kept == Set(2L, 3L))
  }
}
