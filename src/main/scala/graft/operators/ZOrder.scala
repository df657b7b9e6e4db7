package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout for multi-dimensional scan pruning.
  *
  * Range-partitioning a 100-TB table by ONE column makes filters on that
  * column prune files, and filters on every other column scan everything.
  * Interleaving the bits of several columns into one z-value and laying data
  * out in z-order makes each output file cover a compact hyper-rectangle of
  * the combined key space — parquet min/max stats then prune filters on ANY
  * prefix-queried dimension (the Delta/Iceberg OPTIMIZE ZORDER technique).
  *
  * The z-value is pure built-in bit arithmetic (shift/and/or — codegen'd,
  * UDF-free) and is deterministic, so it is exactly replayable in a SQL
  * oracle. The reference engine has no layout operators; north-star
  * extension surface (SURVEY.md §2.4 family).
  */
object ZOrder {

  /** Interleave the low `bits` bits of each column: column `i` contributes
    * bit `b` at output position `b * n + i` (bit-0-first round-robin).
    * Inputs must lie in `[0, 2^bits)` — enforced per row (`raise_error`),
    * because silent truncation would corrupt the curve, breaking pruning
    * guarantees downstream. `n * bits` must fit in a signed long. */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 2, "zValue needs at least two columns to interleave")
    require(bits > 0 && n * bits <= 63, s"n*bits must be in (0, 63], got ${n * bits}")
    val bound = 1L << bits
    val terms = for {
      (c, ci) <- cols.zipWithIndex
      cl = c.cast("long")
      guarded = when(cl.isNull || cl < 0 || cl >= bound,
        raise_error(concat(lit(s"zValue: input $ci out of [0, $bound): "),
          coalesce(cl.cast("string"), lit("null"))))).otherwise(cl)
      b <- 0 until bits
    } yield shiftleft(shiftright(guarded, b).bitwiseAND(lit(1L)), b * n + ci)
    terms.reduce(_ bitwiseOR _)
  }

  /** Lay `df` out in z-order across `numFiles` partitions: range-partition
    * by z-value, sort within each partition. Every partition (→ output
    * file) covers a contiguous, disjoint z-range = a compact region of the
    * multi-dimensional key space. Write the result with any sink; the
    * parquet row-group stats do the pruning from then on. */
  def layoutByZOrder(
      df: DataFrame,
      colNames: Seq[String],
      bits: Int,
      numFiles: Int): DataFrame = {
    require(numFiles > 0, "numFiles must be positive")
    df.withColumn("__graft_z", zValue(colNames.map(col), bits))
      .repartitionByRange(numFiles, col("__graft_z"))
      .sortWithinPartitions("__graft_z")
      .drop("__graft_z")
  }
}
