package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamOps
import graft.testkit.DatasetComparisons._

class StreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def batchEvents = spark.read.parquet(s"$sf/events.parquet")
    .withColumnRenamed("ts", "ts_ns")
    .withColumn("ts", timestamp_micros((col("ts_ns") / 1000L).cast("long")))

  test("streaming windowed counts equal the batch aggregation") {
    val streamed = StreamOps.runToMemory(spark,
      StreamOps.windowedCounts(StreamOps.eventsStream(spark, s"$sf/events.parquet")),
      "t_stream_hourly")
      .select(col("window.start").as("wstart"), col("event_type"), col("n"))
    val batch = batchEvents
      .groupBy(window(col("ts"), "1 hour").getField("start").as("wstart"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
    streamed.ensureDatasetEquals(batch)
  }

  test("streaming session counts: sessions partition events, gaps respected") {
    val sessions = StreamOps.runToMemory(spark,
      StreamOps.sessionCounts(StreamOps.eventsStream(spark, s"$sf/events.parquet")),
      "t_stream_sessions")
    val totalEvents = sessions.agg(sum("n_events")).head().getLong(0)
    assert(totalEvents == batchEvents.count())
    assert(sessions.filter(col("n_events") <= 0).isEmpty)
  }

  test("salted stream-static join equals the plain batch join") {
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .withColumnRenamed("c_custkey", "user_id")
    val streamed = StreamOps.runToMemory(spark,
      StreamOps.streamStaticSkewJoin(
        StreamOps.eventsStream(spark, s"$sf/events.parquet"), cust, Seq("user_id"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n")),
      "t_stream_join")
    val batch = batchEvents.join(cust, Seq("user_id"), "inner")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
    streamed.ensureDatasetEquals(batch)
  }
}
