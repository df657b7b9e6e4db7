package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Length-bucketed batch assignment: group documents of similar token
  * length into fixed-size training batches, so per-batch padding waste is
  * bounded by the bucket width instead of the corpus-wide length spread
  * (the dynamic-batching trick, materialized as a reproducible column).
  *
  * Rows bucket by `floor(len / bucketWidth)`; within a bucket they rank
  * by (length, id) — the [[graft.operators.GroupedRank]] distributed rank,
  * so a dominant bucket never funnels through one task — and batch
  * `floor((rank-1) / batchSize)` groups `batchSize` consecutive rows.
  * Output adds `len_bucket` and `batch_idx` (batch ids are unique per
  * (len_bucket, batch_idx) pair). Deterministic, partitioning-independent,
  * exactly SQL-replayable. */
object Batching {

  def batchByLength(
      df: DataFrame,
      idCol: String,
      lenCol: String,
      batchSize: Int,
      bucketWidth: Long = 64L): DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    require(bucketWidth > 0, "bucketWidth must be positive")
    val bucketed = df.withColumn("len_bucket",
      floor(col(lenCol) / bucketWidth).cast("long"))
    graft.operators.GroupedRank
      .withGroupRank(bucketed, Seq("len_bucket"),
        Seq(col(lenCol), col(idCol)), "__graft_brank")
      .withColumn("batch_idx",
        expr(s"(__graft_brank - 1) DIV $batchSize"))
      .drop("__graft_brank")
  }
}
