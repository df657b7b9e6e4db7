package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign each document, in a stable global order, to a
  * fixed token-budget training chunk — the "concatenate the corpus and cut
  * at context-length boundaries" step of an LLM data pipeline. Row `i` goes
  * to chunk `floor(cumulativeWeightBefore(i) / budget)` where the cumulative
  * sum runs over `orderCol` order.
  *
  * '''Plan shape (the 100-TB design).''' The direct formulation — one
  * global-order window cumsum — funnels the whole corpus through a single
  * task. Instead a two-phase distributed prefix sum:
  *
  *  1. rows bucket by `floor(orderCol / bucketWidth)`; per-bucket weight
  *     totals are a map-side-combined aggregate (one small result per
  *     bucket, collected to the driver). `bucketWidth` defaults to
  *     AUTO-DERIVED from the observed `orderCol` span (one cheap min/max
  *     aggregate) so the driver never holds more than ~2¹⁶ bucket rows —
  *     no id-space sparsity can misconfigure it into a driver OOM. The
  *     assignment itself is bucketWidth-INDEPENDENT (bucketing only
  *     decomposes the prefix sum), so auto vs explicit width cannot change
  *     results;
  *  2. exclusive bucket offsets broadcast back; the within-bucket cumsum is
  *     a window partitioned BY BUCKET — thousands of independent,
  *     bounded-size sorts instead of one global one.
  *
  * The chunk assignment is a pure function of the data (not of
  * partitioning), so results are reproducible across cluster sizes and
  * re-runs — and expressible as a plain SQL window cumsum for the oracle.
  *
  * `orderCol` must be unique per row (a document id); weights must be
  * non-negative. Division uses integral `DIV`, exact at any scale.
  */
object SequencePack {

  /** Driver-side bucket-row budget for the auto-derived width. */
  private val TargetBuckets = 1L << 16

  /** Width making `floor(orderCol / width)` span at most ~2¹⁶ distinct
    * buckets over `[mn, mx]`, for ANY id-space sparsity or offset — the
    * span is computed in BigInt because `mx - mn` overflows Long when the
    * keys span more than half the 64-bit range (e.g. raw xxhash64 keys),
    * which would collapse the width to 1 and re-create the driver
    * blow-up this function exists to prevent. */
  private[graft] def autoBucketWidth(mn: Long, mx: Long): Long =
    ((BigInt(mx) - BigInt(mn)) / TargetBuckets + 1).max(1).toLong

  def packSequences(
      df: DataFrame,
      orderCol: String,
      weightCol: String,
      budget: Long,
      bucketWidth: Option[Long] = None): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(bucketWidth.forall(_ > 0), "bucketWidth must be positive")
    val spark = df.sparkSession
    import spark.implicits._

    val width = bucketWidth.getOrElse {
      // one column-pruned min/max aggregate; an empty corpus gets width 1
      val r = df.filter(col(orderCol).isNotNull)
        .agg(min(col(orderCol).cast("long")), max(col(orderCol).cast("long")))
        .collect()(0)
      if (r.isNullAt(0)) 1L else autoBucketWidth(r.getLong(0), r.getLong(1))
    }

    // the documented preconditions are enforced, not assumed: null order keys
    // or weights would otherwise surface as a driver-side NPE on the bucket
    // totals (sum over an all-null bucket is null), and negative weights make
    // chunk ids non-monotone — fail the job at the offending row instead
    val base = df
      .filter(col(orderCol).isNotNull)
      .withColumn("__graft_w",
        when(col(weightCol).isNull || col(weightCol) < 0,
          raise_error(concat(
            lit(s"packSequences: $weightCol must be non-null and >= 0, got "),
            coalesce(col(weightCol).cast("string"), lit("null")))))
          .otherwise(col(weightCol).cast("long")))
      .withColumn("__graft_bucket",
        floor(col(orderCol) / width).cast("long"))

    val totals = base.groupBy("__graft_bucket")
      .agg(sum("__graft_w").as("__t"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (b, t) =>
      val row = (b, acc); acc += t; row
    }.toSeq
    val offDf = offsets.toDF("__graft_bucket", "__graft_offset")

    val w = Window.partitionBy("__graft_bucket").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(broadcast(offDf), Seq("__graft_bucket"))
      .withColumn("__graft_cum", sum(col("__graft_w")).over(w))
      .withColumn("chunk_id",
        expr(s"(__graft_offset + __graft_cum - __graft_w) DIV $budget"))
      .drop("__graft_bucket", "__graft_w", "__graft_cum", "__graft_offset")
  }

  /** Token-balanced shard assignment for training-data export: cut the
    * corpus, in `orderCol` order, into exactly `nShards` contiguous spans
    * of near-equal total weight (per-shard budget `ceil(total/nShards)`,
    * so `shard_id` ∈ [0, nShards) by construction) and tag each row with
    * its `shard_id`. Contiguity in the order key keeps related documents
    * co-located in a shard file while the prefix-sum cut equalizes token
    * mass — the "write N balanced training files" step, where balancing
    * by ROW count would skew shard token totals by document length.
    *
    * Costs one extra column-pruned total-weight aggregate over
    * [[packSequences]] (the budget depends on the grand total); the
    * assignment itself is the same two-phase distributed prefix sum — no
    * global-order window, driver holds one long plus the ≤2¹⁶ bucket
    * offsets. Same preconditions as [[packSequences]]: unique non-null
    * `orderCol`, non-negative weights. A total of 0 puts every row in
    * shard 0.
    */
  def shardByTokens(
      df: DataFrame,
      orderCol: String,
      weightCol: String,
      nShards: Int): DataFrame = {
    require(nShards >= 1, "nShards must be at least 1")
    val total = df.filter(col(orderCol).isNotNull)
      .agg(coalesce(sum(col(weightCol).cast("long")), lit(0L)))
      .collect()(0).getLong(0)
    val budget = math.max((total + nShards - 1) / nShards, 1L)
    packSequences(df, orderCol, weightCol, budget)
      .withColumnRenamed("chunk_id", "shard_id")
  }
}
