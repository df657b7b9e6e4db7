package graft.sketch

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HyperLogLog-style distinct-count sketch built from engine-portable
  * primitives — per group, `m = 2^p` register buckets each holding the
  * max leading-zero rank seen, then the classic harmonic-mean estimator
  * in pure integer arithmetic. Complements [[KmvOps]] (k-minimum-values):
  * HLL state is `m` bytes vs KMV's `k` longs and merges by elementwise
  * max, which is why it's the industry default for streaming/mergeable
  * distinct counts; both live here so pipelines can cross-check one
  * sketch against the other.
  *
  * '''Engine-exact by construction.''' The hash is the house 48-bit md5
  * prefix (`('0x'||substr(md5(v),1,12))::BIGINT` in DuckDB) — bucket is
  * the top `p` bits, and the register rank is derived from the minimal
  * binary rendering of the remaining `48−p` bits (`length(bin(x))`,
  * identical in Spark and DuckDB — no float `log2`, no leading-zeros
  * intrinsic). The estimator runs entirely in integers: the harmonic
  * denominator `Σ 2^(−reg)` is kept in Q-format scaled by `2^(48−p)`
  * (every term `1 << (48−p+1−reg)` is a positive integer since
  * `reg ≤ 48−p+1`), and the final `α·m²/denom` is one decimal(38,0)
  * integer division — bit-identical across engines and partitionings.
  * We report the raw HLL estimator plus `zero_buckets` so a consumer can
  * apply small-range linear counting themselves (that branch needs a
  * float `ln`, which would break replayability).
  *
  * '''Plan shape (100 TB).''' `groupBy (group, bucket) max(reg)` — the
  * register build is map-side combined down to `#groups·m` rows through
  * the exchange regardless of input size; the estimate is a second
  * `#groups·m → #groups` fold. No distinct, no window, no per-key state
  * beyond one byte-sized max per bucket.
  */
object HllOps {

  /** Per-group registers `(groupCols*, bucket, reg)`: bucket = top `p`
    * hash bits, reg = leading-zero rank (1-based) of the low `48−p` bits.
    * Absent buckets mean "register 0" (no value hashed there). */
  def hllRegisters(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      p: Int): DataFrame = {
    require(p >= 2 && p <= 16, s"p must be in [2,16]: got $p")
    val sfx = 48 - p
    val h = conv(substring(md5(col(valueCol).cast("string")), 1, 12), 16, 10)
      .cast("long")
    df.filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+ h.as("__h"): _*)
      .withColumn("bucket", expr(s"__h div ${1L << sfx}"))
      .withColumn("__sfx", expr(s"__h % ${1L << sfx}"))
      .withColumn("reg",
        when(col("__sfx") === 0, lit(sfx + 1))
          .otherwise(lit(sfx + 1) - length(bin(col("__sfx"))))
          .cast("long"))
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(max("reg").as("reg"))
  }

  /** Pairwise SET-OPERATION estimates between groups' register sketches:
    * HLL's defining algebra — the union sketch is the ELEMENTWISE MAX of
    * registers (exactly the sketch the union stream would have built), so
    * `est_union` is the standard estimator over the merged registers and
    * `est_intersect = max(0, est_a + est_b − est_union)` by
    * inclusion–exclusion. Runs entirely on the #groups × m register
    * frame — model-scale, never re-touching raw data (the same property
    * [[graft.sketch.KmvOps.kmvSetEstimates]] shows for k-min sketches;
    * both sketch algebras live here so pipelines can cross-check).
    *
    * '''Plan shape.''' Bucket-grain pair join on (bucket) within the
    * group-pair cross (p groups → p(p−1)/2 pairs × m rows), one greatest()
    * fold per pair, then the integer estimator — all exact, engine-
    * portable, partitioning-independent. */
  def hllSetEstimates(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      p: Int): DataFrame = {
    val regs = hllRegisters(df, Seq(groupCol), valueCol, p)
      .localCheckpoint() // four consumers below; #groups × m rows — tiny
    val est = estimateFromRegisters(regs, Seq(groupCol), p)
      .select(col(groupCol), col("est_distinct"))
    // group-pair cross (tiny, broadcast) × each member's registers,
    // union-all reshaped so a bucket present in EITHER side reaches the
    // pair's max-fold (a bucket join would drop buckets one side lacks)
    val groups = regs.select(col(groupCol)).distinct()
    val pairs = groups.select(col(groupCol).as("group_a"))
      .crossJoin(broadcast(groups.select(col(groupCol).as("group_b"))))
      .filter(col("group_a") < col("group_b"))
    val aRegs = pairs.join(regs, col(groupCol) === col("group_a"))
      .select(col("group_a"), col("group_b"), col("bucket"), col("reg"))
    val bRegs = pairs.join(regs, col(groupCol) === col("group_b"))
      .select(col("group_a"), col("group_b"), col("bucket"), col("reg"))
    val mergedRegs = aRegs.unionByName(bRegs)
      .groupBy("group_a", "group_b", "bucket")
      .agg(max("reg").as("reg"))
    estimateFromRegisters(mergedRegs, Seq("group_a", "group_b"), p)
      .select(col("group_a"), col("group_b"),
        col("est_distinct").as("est_union"))
      .join(broadcast(est.select(col(groupCol).as("group_a"),
        col("est_distinct").as("est_a"))), Seq("group_a"))
      .join(broadcast(est.select(col(groupCol).as("group_b"),
        col("est_distinct").as("est_b"))), Seq("group_b"))
      .withColumn("est_intersect",
        greatest(col("est_a") + col("est_b") - col("est_union"), lit(0L)))
      .select("group_a", "group_b", "est_a", "est_b", "est_union",
        "est_intersect")
  }

  /** Per-group `(groupCols*, m, used_buckets, zero_buckets, denom_q,
    * est_distinct)`: the integer HLL estimate
    * `floor(α_scaled·m²·2^(48−p) / (1000·denom))` with `α_scaled = 709`
    * for m ≥ 64 (0.709 in thousandths — fixed here so both engines use
    * the identical constant; the m-dependent refinements differ past the
    * third decimal and would buy nothing at this register width). */
  def hllEstimate(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      p: Int): DataFrame =
    estimateFromRegisters(
      hllRegisters(df, groupCols, valueCol, p), groupCols, p)

  /** The integer estimator over an existing `(groupCols*, bucket, reg)`
    * register frame — shared by [[hllEstimate]] (direct) and
    * [[hllSetEstimates]] (merged pair registers). */
  private def estimateFromRegisters(
      regs: DataFrame, groupCols: Seq[String], p: Int): DataFrame = {
    val m = 1L << p
    val sfx = 48 - p
    regs
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("used_buckets"),
        sum(expr(s"shiftleft(1L, cast(${sfx + 1} - reg as int))"))
          .as("__present_q"))
      .withColumn("m", lit(m))
      .withColumn("zero_buckets", lit(m) - col("used_buckets"))
      // an absent bucket holds register 0, contributing 2^(−0) = 1, which
      // at scale 2^(sfx+1) is the full 2^(sfx+1) per zero bucket
      .withColumn("denom_q",
        col("__present_q") + col("zero_buckets") * lit(1L << (sfx + 1)))
      .withColumn("est_distinct", expr(
        s"(cast(709 as decimal(38,0)) * $m * $m * ${1L << (sfx + 1)}) div " +
          s"(1000 * cast(denom_q as decimal(38,0)))"))
      .select(groupCols.map(col) ++ Seq(col("m"), col("used_buckets"),
        col("zero_buckets"), col("denom_q"), col("est_distinct")): _*)
  }
}
