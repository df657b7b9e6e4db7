package graft.sources

import org.apache.spark.sql.Dataset

/** Adaptive read-side parallelism repair (optimization guide §2.5, "input
  * skew: one huge unsplittable file … repartition immediately after the
  * read").
  *
  * Heavy per-row compute placed directly above a scan inherits the SCAN's
  * parallelism, which is a property of the file layout, not of the work: a
  * single-row-group parquet file is one split however small
  * `maxPartitionBytes` goes, so a 32-core session runs the whole
  * decode/shingle/score stage in ONE task (measured r18: knn_graph spent
  * 6.3 of its 6.7 s in a 1-task stage; every multimodal decode query ran
  * its codec serially).
  *
  * [[spread]] round-robin-repartitions ONLY when the planned scan
  * parallelism is materially below the session's core count, so
  * well-partitioned inputs — the 100-TB case, where a scan has thousands
  * of splits — pass through with no added exchange. Call it on the
  * NARROW frame (ids, or ids + small payload) feeding the heavy stage, so
  * the added exchange, when it does fire, ships the lightweight proxy and
  * never the decoded/derived payload (guide §2.3). Round-robin
  * repartition is deterministic under Spark's sort-before-repartition
  * default, and every caller's result is partition-layout-independent
  * (per-row maps + aggregates), so results are unchanged by construction.
  */
object Spread {
  def spread[T](ds: Dataset[T]): Dataset[T] = {
    val target = ds.sparkSession.sparkContext.defaultParallelism
    // .rdd only plans (no job); planned partition count is the scan split
    // count for read-rooted frames — exactly the parallelism the stage
    // above would inherit
    if (ds.rdd.getNumPartitions * 2 <= target) ds.repartition(target) else ds
  }
}
