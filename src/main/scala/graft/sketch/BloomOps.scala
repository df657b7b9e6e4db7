package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter semi-join reduction: the second sketch family next to the
  * CMS ops (same shape the reference uses CMS for — a tiny summary of one
  * side consulted row-by-row on the other; reference sketch usage:
  * Utils.scala:108-122).
  *
  * The 100-TB story: joining a 100-TB fact table to a filtered dimension
  * shuffles the whole fact side, even though most rows match nothing. A
  * bloom filter over the dimension's join keys (MB-scale for millions of
  * keys, built in one O(|dim|) job like the CMS) rides to executors as a
  * plan literal and drops non-matching fact rows AT THE SCAN, before the
  * shuffle. False positives survive the prefilter and are removed by the
  * exact join that follows — so the result is exactly the plain join;
  * false negatives are impossible. This is Spark's own InjectRuntimeFilter
  * technique surfaced as an explicit, configurable operator (usable where
  * AQE's heuristics decline to fire).
  */
object BloomOps {

  /** xxhash64 of the key tuple — BloomFilterAggregate/MightContain operate
    * on 64-bit hashes; both sides must use the identical hash. */
  private def keyHash(cols: Seq[Column]): Column = xxhash64(cols: _*)

  /** Build a bloom filter over `keyCols` of `df` (eager, one aggregate job;
    * the returned sketch is a model parameter — `numBits/8` bytes,
    * independent of |df|). */
  def bloomOf(df: DataFrame, keyCols: Seq[String],
      expectedItems: Long = 1000000L, numBits: Long = 8L * 1024 * 1024): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      Bridge.expression(keyHash(keyCols.map(col))),
      Literal(expectedItems), Literal(numBits))
    df.select(Bridge.column(agg.toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** Probe column: true iff the key tuple MIGHT be in the bloom (no false
    * negatives). */
  def mightContain(bloom: Array[Byte], keyCols: Seq[Column]): Column =
    Bridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      Bridge.expression(keyHash(keyCols))))

  /** `big ⋈ small` with the big side bloom-prefiltered on the join keys.
    * Result equals `big.join(small, usingCols, joinType)` exactly.
    * Restricted to join types where dropping non-matching BIG rows is
    * semantics-preserving (inner / left_semi / right_outer keep no
    * unmatched big-side rows). */
  def bloomPrefilteredJoin(
      big: DataFrame, small: DataFrame, usingCols: Seq[String],
      joinType: String = "inner",
      expectedItems: Long = 1000000L, numBits: Long = 8L * 1024 * 1024): DataFrame = {
    val ok = Set("inner", "leftsemi", "right", "rightouter")
    require(ok.contains(joinType.toLowerCase.replace("_", "")),
      s"bloom prefilter would drop unmatched big-side rows for joinType=$joinType")
    val bloom = bloomOf(small, usingCols, expectedItems, numBits)
    big.filter(mightContain(bloom, usingCols.map(big(_))))
      .join(small, usingCols, joinType)
  }
}
