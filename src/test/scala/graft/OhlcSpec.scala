package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the argmax-as-aggregate OHLC shape: first/last by time via min/max
  * over an injective struct — field order (ts, id, value) decides, the
  * value rides along; ties on ts fall to event_id deterministically. */
class OhlcSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("open/close pick by (ts, id) with value riding; lo/hi independent") {
    import spark.implicits._
    val df = Seq(
      // (type, ts_ns, event_id, value) — day 0
      ("a", 100L, 2L, 5.0), ("a", 100L, 1L, 9.0), // tie on ts → id 1 opens
      ("a", 300L, 3L, 1.0), ("a", 200L, 4L, 7.0)
    ).toDF("event_type", "ts_ns", "event_id", "value")
    val got = df.withColumn("day", expr("ts_ns DIV 86400000000000"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n"),
        min(struct(col("ts_ns"), col("event_id"), col("value")))
          .getField("value").as("open"),
        max(struct(col("ts_ns"), col("event_id"), col("value")))
          .getField("value").as("close"),
        min("value").as("lo"), max("value").as("hi"))
      .head()
    assert(got.getLong(2) == 4L)
    assert(got.getDouble(3) == 9.0) // earliest ts, smaller id wins the tie
    assert(got.getDouble(4) == 1.0) // latest ts closes, regardless of value
    assert(got.getDouble(5) == 1.0 && got.getDouble(6) == 9.0)
  }
}
