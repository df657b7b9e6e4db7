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

  test("gap census: leading, inner, and trailing gaps against the global span") {
    import spark.implicits._
    val H = 3600000000000L
    // global span = hours [0, 5]; A observes {0,1,5}, B observes {3}
    val rows = Seq(("A", 0L), ("A", 1L), ("A", 5L), ("B", 3L))
      .map { case (t, hr) => (t, hr * H + 7L) }
    val hours = rows.toDF("event_type", "ts_ns")
      .withColumn("hour", expr("ts_ns DIV 3600000000000"))
      .groupBy("event_type", "hour").agg(count(lit(1)).as("__n"))
    val span = hours.agg(min("hour").as("__h0"), max("hour").as("__h1"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("hour")
    val got = hours.crossJoin(broadcast(span))
      .withColumn("__prev", lag("hour", 1).over(w))
      .withColumn("__gap",
        when(col("__prev").isNull, col("hour") - col("__h0"))
          .otherwise(col("hour") - col("__prev") - 1))
      .groupBy("event_type")
      .agg(first("__h1").as("__e1"), first("__h0").as("__e0"),
        count(lit(1)).as("obs"), sum("__gap").as("__im"),
        max("__gap").as("__mg"), max("hour").as("__last"))
      .select(col("event_type"), (col("__e1") - col("__e0") + 1).as("exp"),
        col("obs"), (col("__im") + (col("__e1") - col("__last"))).as("miss"),
        greatest(col("__mg"), col("__e1") - col("__last")).as("lg"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("A") == ((6L, 3L, 3L, 3L))) // inner gap hours 2..4
    assert(got("B") == ((6L, 1L, 5L, 3L))) // leading 3, trailing 2
  }
}
