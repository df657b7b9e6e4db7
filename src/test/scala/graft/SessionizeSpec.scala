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
}
