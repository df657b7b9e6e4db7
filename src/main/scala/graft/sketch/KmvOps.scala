package graft.sketch

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** K-minimum-values (KMV) distinct-count sketch, per group: hash every
  * value onto `[0, 2^48)`, keep each group's k smallest DISTINCT hashes,
  * and estimate the group's distinct count from how tightly they crowd
  * zero — `(k-1)·M div h_k` for the kth-smallest hash `h_k` over range
  * `M = 2^48` (Bar-Yossef et al.'s unbiased KMV estimator, integerized).
  * The cardinality diagnostic for corpus/event tables where an exact
  * `count(distinct)` is a full extra shuffle of every distinct value —
  * the sketch ships k longs per group.
  *
  * Engine-exact by construction: the hash is a 12-hex-char md5 prefix
  * (`('0x'||substr(md5(v),1,12))::BIGINT` in DuckDB), the k-smallest set
  * is deduplicated before ranking (hash ties collapse identically in
  * both engines), and the estimate is pure integer arithmetic —
  * `(k-1)·M` stays inside int64 for any k ≤ 2^15. A
  * group with fewer than k distinct hashes reports its exact count.
  *
  * '''Plan shape (the 100-TB design).''' One distinct on (group, hash)
  * — map-side combined, so a value repeated 10⁹ times in a group ships
  * once — then a [[graft.operators.GroupedRank]] k-smallest per group
  * (range partition + local ranks: no single-task sort when one group
  * holds most of the table, the usual shape for event types), then a
  * per-group aggregate of k rows. */
object KmvOps {

  /** Hash range: 12 hex chars = 48 bits. */
  val M: Long = 1L << 48

  def kmvDistinct(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int = 16): DataFrame = {
    require(k >= 2, "k must be at least 2")
    require(k <= 32768, s"(k-1)*M must stay inside int64: k=$k exceeds 32768")
    val h = conv(substring(md5(col(valueCol).cast("string")), 1, 12), 16, 10)
      .cast("long")
    val hashed = df
      .select(groupCols.map(col) :+ h.as("__graft_h"): _*)
      .distinct()
    val ranked = graft.operators.GroupedRank.withGroupRank(
      hashed, groupCols, Seq(col("__graft_h")), "__graft_r")
    ranked.filter(col("__graft_r") <= k)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_sample"), max("__graft_h").as("kth_hash"))
      .withColumn("est_distinct",
        when(col("n_sample") < k || col("kth_hash") <= 0, col("n_sample"))
          .otherwise(expr(s"${(k - 1).toLong * M}L div kth_hash")))
  }
}
