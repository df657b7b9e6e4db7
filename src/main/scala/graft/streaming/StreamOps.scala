package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming operators over the events stream: watermarked
  * windowed aggregation, gap-based sessionization, and a salted
  * stream-static join (the streaming face of the skew-join idea).
  *
  * North-star extension (SURVEY.md §2.4 "skewed-stream join"); the reference
  * is batch-only. Everything here is declarative `readStream` → transform →
  * `writeStream`; state stays in Spark's streaming state store, never on the
  * driver.
  */
object StreamOps {

  /** Schema of events.parquet with TIMESTAMP(NANOS) read as nanos-long
    * (`spark.sql.legacy.parquet.nanosAsLong=true`). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanos since epoch
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over an events parquet path; exposes `ts_ns` (exact)
    * and `ts` (microsecond timestamp). The file source requires a directory,
    * so a lone file is exposed through a temp dir holding a symlink. */
  def eventsStream(spark: SparkSession, path: String): DataFrame = {
    val f = new java.io.File(path)
    val dir =
      if (f.isFile) {
        val d = java.nio.file.Files.createTempDirectory("graft_stream_")
        java.nio.file.Files.createSymbolicLink(
          d.resolve(f.getName), f.toPath.toAbsolutePath)
        d.toFile.deleteOnExit()
        d.toString
      } else path
    spark.readStream
      .schema(eventsSchema)
      .parquet(dir)
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros((col("ts_ns") / 1000L).cast("long")))
  }

  /** Tumbling-window counts per event type (with watermark so the query is
    * append-capable on a live stream; memory-sink tests use complete mode). */
  def windowedCounts(stream: DataFrame, windowLen: String = "1 hour",
      watermark: String = "1 hour"): DataFrame =
    stream
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), min("value").as("min_v"), max("value").as("max_v"))

  /** Gap-based sessionization per user via `session_window` (state-store
    * backed; the declarative alternative to hand-rolled mapGroupsWithState). */
  def sessionCounts(stream: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    stream
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))

  /** Salted stream-static equi-join: static side replicated `saltBuckets`
    * times, stream rows salted uniformly — hot keys in the stream spread
    * across `saltBuckets` tasks instead of hammering one. Row multiset
    * equals the plain stream-static join for any key cardinalities (each
    * stream row meets exactly one replica of every matching static row).
    */
  def streamStaticSkewJoin(
      stream: DataFrame,
      static: DataFrame,
      usingColumns: Seq[String],
      saltBuckets: Int = 8,
      seed: Long = 1L): DataFrame = {
    val salted = stream.withColumn("__graft_salt",
      floor(rand(seed) * saltBuckets).cast("int"))
    val replicated = static.withColumn("__graft_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, usingColumns :+ "__graft_salt", "inner")
      .drop("__graft_salt")
  }

  /** Run a (bounded) streaming DataFrame to completion through a memory sink
    * and return the materialized result — the test/verify harness for the
    * operators above. */
  def runToMemory(spark: SparkSession, df: DataFrame, name: String,
      outputMode: String = "complete"): DataFrame = {
    val q = df.writeStream
      .outputMode(outputMode)
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
  }
}
