package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed managed-table source/sink: the shuffle-elimination tool for
  * repeatedly-joined fact tables. Writing both sides of a join bucketed (and
  * sorted) by the join key into `numBuckets` co-located buckets lets every
  * later equi-join or aggregation on that key run WITHOUT a shuffle exchange
  * — the single biggest plan-shape win for a 100-TB fact table joined daily:
  * the shuffle is paid once at write time, then amortized over every read.
  *
  * Uses Spark's native parquet bucketing (Hive-compatible layout, one file
  * group per bucket) via the session catalog; the returned frame reports its
  * bucketing to Catalyst, which then plans `SortMergeJoin` with no
  * `Exchange` on either side when both inputs share bucket spec and count
  * (PlanSpec pins this).
  */
object BucketedTables {

  /** Write `df` as a bucketed, per-bucket-sorted managed parquet table
    * (replacing any previous contents) and return the catalog-backed frame
    * that carries the bucket metadata. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int): DataFrame = {
    require(bucketCols.nonEmpty, "bucketCols must be non-empty")
    require(numBuckets > 0, "numBuckets must be positive")
    val spark = df.sparkSession
    // a previous JVM's managed-table directory survives in the warehouse but
    // not in this session's in-memory catalog; CREATE then fails with
    // LOCATION_ALREADY_EXISTS. Drop the catalog entry AND the leftover dir.
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(ident))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)
    df.sparkSession.table(table)
  }
}
