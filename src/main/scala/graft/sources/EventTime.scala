package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Normalizes an events frame's `ts` across the two fixture generations so
  * every consumer sees BOTH a nanos-long `ts_ns` (exact — matches DuckDB's
  * `epoch_ns(ts)` bit-for-bit) and a microsecond session-UTC TIMESTAMP `ts`:
  *
  *  - parquet TIMESTAMP(NANOS) (pre-round-9 fixtures) loads as a long under
  *    `spark.sql.legacy.parquet.nanosAsLong=true`; `ts` is its integer-DIV
  *    µs truncation (floor — the DuckDB TIMESTAMP_NS→µs rule; double
  *    division would round ~25% of values up one µs);
  *  - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) (round-9 fixtures)
  *    loads as TIMESTAMP_NTZ; the cast to the session-UTC instant type is
  *    wall-clock-preserving under the UTC session, exactly like DuckDB's
  *    naive read, and `ts_ns` is `unix_micros·1000` = `epoch_ns`.
  *
  * Works on batch and streaming frames alike (pure projections).
  */
object EventTime {

  def withTsNs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns DIV 1000")))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
          .withColumn("ts_ns", unix_micros(col("ts")) * 1000)
    }
}
