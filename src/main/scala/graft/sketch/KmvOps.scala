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
  * '''Plan shape (the 100-TB design).''' ONE aggregate job over the
  * table: the custom [[graft.functions.KmvSketchAgg]]
  * `TypedImperativeAggregate` keeps ≤ k longs of partial state per
  * (group, partition) — map-side combined like a sum, so a group with
  * 10⁹ distinct values ships k longs per partition, and its merge (set
  * union, keep k smallest) is the KMV monoid, order-insensitive by
  * construction. The previous composable formulation (distinct on
  * (group, hash) → GroupedRank k-smallest) shipped every distinct hash
  * through two exchanges before discarding all but k — correct, but a
  * full-distinct-cardinality shuffle this version never pays. NULL
  * values contribute no distinct value. */
object KmvOps {

  /** Hash range: 12 hex chars = 48 bits. */
  val M: Long = 1L << 48

  private def requireK(k: Int): Unit = {
    require(k >= 2, "k must be at least 2")
    require(k <= 32768, s"(k-1)*M must stay inside int64: k=$k exceeds 32768")
  }

  /** Raw per-group sketches: `(groupCols..., kmv_sketch, kmv_k)` where the
    * sketch is the ascending array of the group's k smallest distinct
    * hashes — the persistable/mergeable form ([[kmvMergeDistinct]]
    * re-aggregates stored sketches to coarser groups without touching the
    * raw data). `kmv_k` persists the BUILD k beside every sketch (r17):
    * merging with a k larger than the build k yields a well-shaped but
    * WRONG sketch (an input array shorter than k is indistinguishable
    * from a legitimately small group), so the k column rides the table
    * and the merge paths validate it per-row with a loud error. */
  def kmvSketch(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int = 16): DataFrame = {
    requireK(k)
    val h = conv(substring(md5(col(valueCol).cast("string")), 1, 12), 16, 10)
      .cast("long")
    // COUNT DISTINCT skips NULLs (SQL convention) — made explicit here
    // rather than trusting the aggregator to drop the null hash
    df.filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+ h.as("__graft_h"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(graft.functions.KmvSketchAgg.kmvKMins(col("__graft_h"), k)
        .as("kmv_sketch"))
      .withColumn("kmv_k", lit(k))
  }

  private def estimateFrom(
      sketches: DataFrame, groupCols: Seq[String], sketchCol: String,
      k: Int): DataFrame =
    sketches
      .select(groupCols.map(col) :+
        size(col(sketchCol)).cast("long").as("n_sample") :+
        // get() is 0-based and null-on-out-of-bounds: an all-NULL group's
        // empty sketch yields kth_hash NULL instead of an index error
        get(col(sketchCol), size(col(sketchCol)) - 1).as("kth_hash"): _*)
      .withColumn("est_distinct",
        when(col("n_sample") < k || col("kth_hash") <= 0, col("n_sample"))
          .otherwise(expr(s"${(k - 1).toLong * M}L div kth_hash")))

  def kmvDistinct(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int = 16): DataFrame = {
    requireK(k)
    estimateFrom(kmvSketch(df, groupCols, valueCol, k), groupCols,
      "kmv_sketch", k)
  }

  /** Rolling-window distinct counts by KMV sketch RE-AGGREGATION — the
    * property that makes sketches the 100-TB answer: per-bucket k-min
    * sketches are built in ONE corpus pass, and every sliding window's
    * estimate comes from MERGING the bucket sketches (union of k-min sets
    * = k-min set of the union), never from re-scanning raw data per
    * window. A 24-bucket window over a year of hourly buckets costs
    * #groups × #buckets × windowBuckets × k longs — model-scale — where
    * the naive `count(distinct) OVER (RANGE 24 hours)` re-shuffles the
    * corpus once per window.
    *
    * Output per (group, bucket): the window `[bucket − windowBuckets + 1,
    * bucket]` estimate in [[kmvDistinct]]'s exact integer form
    * (`n_sample`, `kth_hash`, `est_distinct`), evaluated at every
    * OBSERVED bucket. The merge is the same [[graft.functions.KmvSketchAgg]]
    * bounded-state aggregate over the exploded bucket sketches —
    * re-aggregation IS the aggregate, no new estimator to trust. */
  def kmvRollingDistinct(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      bucket: org.apache.spark.sql.Column, windowBuckets: Int,
      k: Int = 16): DataFrame = {
    requireK(k)
    require(windowBuckets >= 1, s"windowBuckets must be ≥ 1: got $windowBuckets")
    val withB = df.withColumn("__graft_bkt", bucket.cast("long"))
    val perBucket = kmvSketch(withB, groupCols :+ "__graft_bkt", valueCol, k)
    val src = groupCols.foldLeft(
        perBucket.withColumnRenamed("__graft_bkt", "__graft_sb")) {
        (d, c) => d.withColumnRenamed(c, s"__graft_s_$c")
      }
    val targets = perBucket.select(
      (groupCols.map(col) :+ col("__graft_bkt")): _*)
    val cond = (groupCols.map(c => col(c) <=> col(s"__graft_s_$c")) :+
      col("__graft_sb").between(
        col("__graft_bkt") - (windowBuckets - 1), col("__graft_bkt")))
      .reduce(_ && _)
    val merged = targets.join(src, cond)
      .select(groupCols.map(col) :+ col("__graft_bkt") :+
        explode(col("kmv_sketch")).as("__graft_h"): _*)
      .groupBy(groupCols.map(col) :+ col("__graft_bkt"): _*)
      .agg(graft.functions.KmvSketchAgg.kmvKMins(col("__graft_h"), k)
        .as("kmv_sketch"))
    estimateFrom(merged, groupCols :+ "__graft_bkt", "kmv_sketch", k)
      .withColumnRenamed("__graft_bkt", "bucket")
  }

  /** SET-OPERATION estimates between every pair of groups' sketches:
    * `est_union` and `est_intersect` distinct counts from the k-min
    * arrays alone — the audience-overlap question ("how many users do
    * click and purchase share?") answered WITHOUT re-scanning raw data:
    * the union estimate is the KMV estimator over the merged k-mins, and
    * the intersection uses the classic KMV overlap ratio — of the union's
    * k smallest hashes, the fraction present in BOTH sketches estimates
    * the Jaccard, so `est_intersect = shared · est_union div u_n` (all
    * integer arithmetic; `shared ≤ k` keeps the product far inside
    * int64).
    *
    * '''Plan shape.''' The pairwise group join runs over the SKETCH table
    * (#groups rows of k longs — model-scale); array merge/intersect per
    * pair are codegen'd built-ins. Never touches the raw corpus. */
  def kmvSetEstimates(
      sketches: DataFrame, groupCol: String, sketchCol: String,
      k: Int = 16): DataFrame = {
    requireK(k)
    val a = sketches.select(col(groupCol).as("group_a"), col(sketchCol).as("__sa"))
    val b = sketches.select(col(groupCol).as("group_b"), col(sketchCol).as("__sb"))
    a.join(b, col("group_a") < col("group_b"))
      .withColumn("__u",
        slice(array_sort(array_union(col("__sa"), col("__sb"))), 1, k))
      .withColumn("u_n", size(col("__u")).cast("long"))
      .withColumn("__ukth", get(col("__u"), size(col("__u")) - 1))
      .withColumn("est_union",
        when(col("u_n") < k || col("__ukth") <= 0, col("u_n"))
          .otherwise(expr(s"${(k - 1).toLong * M}L div __ukth")))
      .withColumn("shared",
        size(array_intersect(array_intersect(col("__u"), col("__sa")),
          col("__sb"))).cast("long"))
      .withColumn("est_intersect",
        when(col("u_n") === 0, lit(0L))
          .otherwise(expr("(shared * est_union) div u_n")))
      .select("group_a", "group_b", "u_n", "shared", "est_union", "est_intersect")
  }

  /** Sketch ROLLUP: merge fine-grain sketches (each a [[kmvSketch]] array
    * built with the same k) up to `groupCols` and estimate. The k-min-of-
    * union merge is the KMV monoid, so the rolled-up estimate is
    * IDENTICAL to sketching the raw union directly — the re-aggregatable
    * sketch-table pattern: persist per-(source, day) sketches once (k
    * longs each), answer any coarser distinct-count query from the
    * sketch table, never rescanning the corpus.
    *
    * BUILD-K VALIDATION (r17): when the input carries the `kmv_k` column
    * ([[kmvSketch]]'s persist convention), every row's build k is checked
    * against the merge `k` inline — merging at k > build k would sit
    * beyond the persisted k-mins and silently under-sketch the union, so
    * a mismatch raises with both ks named instead. Tables without the
    * column merge unchecked (documented caller contract). */
  def kmvMergeDistinct(
      df: DataFrame, groupCols: Seq[String], sketchCol: String,
      k: Int = 16): DataFrame = {
    requireK(k)
    val checked =
      if (!df.columns.contains("kmv_k")) df
      else df.withColumn(sketchCol,
        when(col("kmv_k") >= k, col(sketchCol))
          .otherwise(raise_error(concat(
            lit(s"kmv_merge build-k mismatch: merge k=$k exceeds build k="),
            col("kmv_k").cast("string"),
            lit(" — positions beyond the build k are not the true k-mins" +
              " of the union; merge at k <= build k")))))
    val merged = checked
      .select(groupCols.map(col) :+ explode(col(sketchCol)).as("__graft_h"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(graft.functions.KmvSketchAgg.kmvKMins(col("__graft_h"), k)
        .as("kmv_sketch"))
    estimateFrom(merged, groupCols, "kmv_sketch", k)
  }
}
