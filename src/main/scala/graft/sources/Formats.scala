package graft.sources

import org.apache.spark.sql.DataFrame

/** Interchange-format sources/sinks beyond parquet: JSONL round-trip and
  * hive-partitioned layouts.
  *
  * The partitioned layout is the other half of the scan-pruning story
  * (BucketedTables covers the join side): writing a corpus partitioned by a
  * low-cardinality column (language, source, date) turns every later
  * filtered read into a directory-level prune — a `lang='fr'` scan reads
  * only `lang=fr/` files, no matter how many petabytes the other partitions
  * hold. PlanSpec pins the `PartitionFilters` shape.
  */
object Formats {

  /** Write `df` as JSON-lines (overwriting `path`) and read it back with the
    * original schema enforced — schema-on-read against inference drift (a
    * JSONL corpus with an all-null or all-integral column would otherwise
    * come back with a different type). */
  def jsonlRoundTrip(df: DataFrame, path: String): DataFrame = {
    df.write.mode("overwrite").json(path)
    df.sparkSession.read.schema(df.schema).json(path)
  }

  /** Write `df` as header-ful CSV (overwriting `path`) and read it back with
    * the original schema enforced — CSV carries no types at all, so
    * schema-on-read is mandatory (inference would demote longs that happen
    * to fit in int, or misread an all-digits string column). Quoting is
    * Spark's RFC-4180 default; embedded commas/quotes survive. */
  def csvRoundTrip(df: DataFrame, path: String): DataFrame = {
    df.write.mode("overwrite").option("header", "true").csv(path)
    df.sparkSession.read.schema(df.schema).option("header", "true").csv(path)
  }

  /** Write `df` as ORC (overwriting `path`) and read it back. ORC is the
    * second self-describing columnar interchange format Spark ships natively
    * (Hive-ecosystem handoff); like parquet it carries its own types, so no
    * schema-on-read defensiveness is needed — the round-trip proves the
    * writer/reader pair preserves longs, doubles and unicode text exactly. */
  def orcRoundTrip(df: DataFrame, path: String): DataFrame = {
    df.write.mode("overwrite").orc(path)
    df.sparkSession.read.orc(path)
  }

  /** Write `df` hive-partitioned by `partCols` (overwriting `path`) and
    * return the partition-aware reader over it. */
  def writePartitioned(df: DataFrame, path: String, partCols: Seq[String]): DataFrame = {
    require(partCols.nonEmpty, "partCols must be non-empty")
    df.write.mode("overwrite").partitionBy(partCols: _*).parquet(path)
    df.sparkSession.read.parquet(path)
  }
}
