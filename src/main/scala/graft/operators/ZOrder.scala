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

  /** Pruning-effectiveness audit for a two-dimensional layout decision —
    * the MEASUREMENT beside [[layoutByZOrder]]'s mechanism: simulate the
    * per-file min/max stats both layouts would write and count what a
    * reader would actually have to scan. The "should we z-order this
    * table" question answered with numbers from the table's own
    * distribution instead of folklore.
    *
    * Layout model (deterministic, so the SQL oracle replays it exactly):
    * `2^filesLog2` equal key-range files; the z layout assigns a row to
    * file `zValue >> (2·bits − filesLog2)` (a file = a z-prefix tile =
    * a compact rectangle of the key plane), the linear layout to file
    * `((d0 << bits) | d1) >> (2·bits − filesLog2)` (d0-major sort). Three
    * canonical probes per layout — a d0-only range, a d1-only range, and
    * the conjunctive box — each counting files (and their resident rows)
    * whose min/max stats OVERLAP the probe, exactly the parquet row-group
    * skipping rule.
    *
    * '''Plan shape (100 TB).''' Both layouts ride ONE scan: each row
    * explodes to its two (layout, file) assignments, one map-side-combined
    * aggregation to per-(layout, file) stats (≤ 2^(filesLog2+1) rows —
    * domain scale), then the probe counts fold that stats frame to two
    * rows. The audited table is never shuffled by anything but the stats
    * aggregation and never scanned twice.
    *
    * @param box0 inclusive `[lo, hi]` probe range on dim 0
    * @param box1 inclusive `[lo, hi]` probe range on dim 1 */
  def pruningAudit(
      df: DataFrame,
      d0: Column,
      d1: Column,
      bits: Int,
      filesLog2: Int,
      box0: (Long, Long),
      box1: (Long, Long)): DataFrame = {
    require(filesLog2 > 0 && filesLog2 <= 2 * bits,
      s"filesLog2 must be in (0, 2*bits], got $filesLog2 with bits=$bits")
    val shift = 2 * bits - filesLog2
    val z = zValue(Seq(d0, d1), bits)
    val lin = shiftleft(d0.cast("long"), bits).bitwiseOR(d1.cast("long"))
    val assigned = df.select(
      d0.cast("long").as("__d0"), d1.cast("long").as("__d1"),
      shiftright(z, shift).as("__zf"), shiftright(lin, shift).as("__lf"))
      .select(col("__d0"), col("__d1"), explode(array(
        struct(lit("zorder").as("layout"), col("__zf").as("file")),
        struct(lit("linear").as("layout"), col("__lf").as("file")))).as("__a"))
    val stats = assigned
      .groupBy(col("__a.layout").as("layout"), col("__a.file").as("file"))
      .agg(count(lit(1)).as("n_rows"),
        min("__d0").as("min0"), max("__d0").as("max0"),
        min("__d1").as("min1"), max("__d1").as("max1"))
    val hit0 = col("min0") <= box0._2 && col("max0") >= box0._1
    val hit1 = col("min1") <= box1._2 && col("max1") >= box1._1
    def cnt(c: Column, v: Column) = sum(when(c, v).otherwise(0L))
    stats.groupBy("layout").agg(
      count(lit(1)).as("n_files"),
      sum("n_rows").as("n_rows"),
      cnt(hit0, lit(1L)).as("files_read_d0"),
      cnt(hit0, col("n_rows")).as("rows_read_d0"),
      cnt(hit1, lit(1L)).as("files_read_d1"),
      cnt(hit1, col("n_rows")).as("rows_read_d1"),
      cnt(hit0 && hit1, lit(1L)).as("files_read_box"),
      cnt(hit0 && hit1, col("n_rows")).as("rows_read_box"))
  }
}
