package graft.skew

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Bridge

/** Data-derived skew diagnosis for a prospective shuffle: BEFORE paying for
  * a join or aggregation on `keyCols`, report the hottest keys with exact
  * counts, each key's load share, and the integer replication (salt count)
  * that would level that key across the target partition count — i.e. the
  * measured starting point for [[SkewJoinConf.replicationFactor]] /
  * [[SkewJoinConf.maxReplication]], turning "this stage is slow, maybe
  * skew?" into numbers.
  *
  * Complements the operator family: [[SkewJoin]] FIXES skew at execution
  * time with a CMS estimate; [[graft.sketch.JoinSizeEstimate]] predicts a
  * join's OUTPUT size; this measures the INPUT key distribution exactly.
  * (For a sketched O(1)-memory variant of the same report, feed the CMS of
  * [[graft.sketch.CmsOps]] with candidate keys — exactness is the point
  * here: the advisor runs offline on a sample day, not in the hot path.)
  *
  * '''Plan shape (the 100-TB design).''' One map-side-combined groupBy on
  * the keys (the same shuffle the diagnosed operation would do, but
  * carrying only key+count); the total re-aggregates the COUNT table
  * (key-cardinality scale) and broadcasts back as a single row; top-k
  * plans as `TakeOrderedAndProject`. All derived metrics are exact integer
  * arithmetic (`IntegralDivide`, ceil via `(a + b − 1) div b`), so the
  * report is engine-portable bit-for-bit.
  */
object SkewAdvisor {

  private def idiv(a: Column, b: Column): Column =
    Bridge.column(new IntegralDivide(
      Bridge.expression(a.cast("long")), Bridge.expression(b.cast("long"))))

  /** Ceil-division for non-negative longs: `⌈a / b⌉ = (a + b − 1) div b`. */
  private def ceilDiv(a: Column, b: Column): Column =
    idiv(a + b - lit(1L), b)

  /** Top-`topK` hottest keys (exact counts, deterministic ties by key) with:
    *  - `n`: exact row count of the key;
    *  - `share_ppm`: the key's share of all rows, in parts per million;
    *  - `ideal_partition_rows`: ⌈total / numPartitions⌉ — a perfectly level
    *    shuffle's per-partition load;
    *  - `recommended_salts`: ⌈n / ideal_partition_rows⌉ — the fragment
    *    count that levels this key (1 = not skewed; the value to feed a
    *    salted-join cap for this key's magnitude).
    */
  def advise(df: DataFrame, keyCols: Seq[String],
      topK: Int = 20, numPartitions: Int = 32): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(topK >= 1 && numPartitions >= 1,
      s"topK and numPartitions must be positive: $topK, $numPartitions")
    val counts = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum("n").as("__total"))
    val ideal = ceilDiv(col("__total"), lit(numPartitions.toLong))
    counts.crossJoin(broadcast(total))
      .select(
        keyCols.map(col) ++ Seq(
          col("n"),
          idiv(col("n") * lit(1000000L), col("__total")).as("share_ppm"),
          ideal.as("ideal_partition_rows"),
          ceilDiv(col("n"), ideal).as("recommended_salts")): _*)
      .orderBy(col("n").desc +: keyCols.map(col): _*)
      .limit(topK)
  }

  /** Cross-COLUMN skew survey — [[advise]] answers "how hot are the keys
    * of THIS column"; this answers "which of these candidate join/group
    * columns is hazardous at all", one row per column from ONE scan:
    *  - `n_nonnull`, `ndv` (exact distinct values);
    *  - `top_count` / `top_share_ppm`: the hottest value's rows and share;
    *  - `hot_over_avg`: top_count div ⌈n/ndv⌉ — how many× the average
    *    key's load the hottest key carries (1 = level; the magnitude that
    *    decides whether a join on this column needs [[SkewJoin]] at all).
    *
    * '''Plan shape (the 100-TB design).''' All candidate columns ride one
    * tagged-union explode (the [[graft.sources.TableProfile]] discipline):
    * one scan, one map-side-combined (column, value) count, then a
    * column-grain rollup. Values compare as strings (the tagged union
    * needs one type); NULLs are excluded — nullability is
    * [[graft.sources.Constraints]]' business. */
  def columnSkewProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    val tagged = df.select(explode(array(cols.map(c =>
      struct(lit(c).as("col_name"), col(c).cast("string").as("__v"))): _*))
      .as("__t"))
      .select(col("__t.col_name").as("col_name"), col("__t.__v").as("__v"))
      .filter(col("__v").isNotNull)
    tagged
      .groupBy("col_name", "__v").agg(count(lit(1)).as("__n"))
      .groupBy("col_name")
      .agg(sum("__n").as("n_nonnull"), count(lit(1)).as("ndv"),
        max("__n").as("top_count"))
      .withColumn("top_share_ppm",
        idiv(col("top_count") * lit(1000000L), col("n_nonnull")))
      .withColumn("hot_over_avg",
        idiv(col("top_count"), ceilDiv(col("n_nonnull"), col("ndv"))))
  }
}
