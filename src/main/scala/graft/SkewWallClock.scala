package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.skew.SkewJoin._
import graft.skew.SkewJoinConf

/** Wall-clock evidence for the flagship claim (VERDICT r13 task 1 / the
  * reference's `README.md:11`): salting parallelizes hot-key join work at
  * replication cost. Prior rounds proved the partition-balance ratio
  * (SkewJoinSpec ≥3×) and the AQE interplay (BENCH_NOTES r13); this main
  * times the join itself, three ways, on a synthesized single-hot-key
  * dataset — committed and reproducible, not asserted.
  *
  * '''The scenario AQE cannot fix.''' Spark's AQE skew split triggers on
  * map-output PARTITION BYTES (256 MB default, and ≥5× median). A hot key
  * whose INPUT is tens of MB but whose join OUTPUT explodes (input rows ×
  * right-side multiplicity) sails under that threshold: the input
  * partitions look balanced, so one task computes the hot key's entire
  * output while the rest of the cluster idles. Key-level salting splits
  * the hot key's WORK, not its input bytes — this is exactly the
  * "key-level vs partition-level mitigation" boundary the r13 interplay
  * pin drew, now measured in seconds.
  *
  * Data (seeded arithmetic only — reproducible, no RNG state): left
  * `nLeft` rows where 30% carry key 0 and the rest spread uniformly over
  * `nKeys` keys; right `nKeys`×`rightMult` rows (every key equally
  * represented). Payloads are md5 hex of the row id — pseudo-random bytes
  * so lz4 can't flatter anyone's shuffle sizes (the r13 lesson: AQE reads
  * COMPRESSED map sizes). Inputs are localCheckpointed before any timing;
  * each leg consumes the join with an aggregate that reads BOTH payloads
  * (a bare count would let Catalyst prune them and time a narrower join
  * than a user would run). Median of `SPARK_GRAFT_ITERS` (default 3).
  *
  * A no-skew control (same sizes, no hot key) times the same plain-vs-salted
  * pair to keep the overhead case honest: when nothing is hot, skewJoin
  * pays its two CMS sketch passes for nothing.
  *
  * Output: one JSON line `{"skew":{...},"uniform":{...},"rows":...}` with
  * seconds per leg; the round's BENCH_NOTES table is copied from it.
  */
object SkewWallClock {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "3").toInt
    val nLeft = sys.env.getOrElse("SPARK_GRAFT_SKEW_NLEFT", "2000000").toLong
    val nKeys = sys.env.getOrElse("SPARK_GRAFT_SKEW_NKEYS", "100000").toLong
    val rightMult = sys.env.getOrElse("SPARK_GRAFT_SKEW_RMULT", "20").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 64 hex chars of md5-derived payload per row, both sides
    def payload(c: org.apache.spark.sql.Column) =
      concat(md5(c.cast("string")), md5((c + 1).cast("string")))

    def leftSide(hot: Boolean): DataFrame = spark.range(nLeft).select(
      (if (hot) when(col("id") % 10 < 3, 0L)
          .otherwise(pmod(xxhash64(col("id")), lit(nKeys)) + 1)
        else pmod(xxhash64(col("id")), lit(nKeys)) + 1).as("key"),
      payload(col("id")).as("pl")).localCheckpoint()

    val right = spark.range((nKeys + 1) * rightMult).select(
      (col("id") % (nKeys + 1)).as("key"),
      payload(col("id") + 1000000000L).as("pr")).localCheckpoint()

    // consume the join end-to-end: count + a hash-sum over each payload so
    // column pruning can't drop either side's bytes from the timed work
    def consume(df: DataFrame): (Long, Long) = {
      // decimal accumulators: a long sum of 2⁶³-scale hashes overflows ANSI
      val r = df.agg(count(lit(1)),
        sum(xxhash64(col("pl")).cast("decimal(38,0)")),
        sum(xxhash64(col("pr")).cast("decimal(38,0)"))).head()
      (r.getLong(0), r.getDecimal(1).hashCode.toLong ^ r.getDecimal(2).hashCode.toLong)
    }

    def median(xs: Seq[Double]): Double = xs.sorted.apply((xs.size - 1) / 2)

    val conf = spark.conf
    def time(aqe: Boolean)(mk: => DataFrame): (Double, Long) = {
      val saved = conf.get("spark.sql.adaptive.enabled")
      conf.set("spark.sql.adaptive.enabled", aqe.toString)
      try {
        var rows = 0L
        val ts = (1 to iters).map { _ =>
          val t0 = System.nanoTime()
          rows = consume(mk)._1
          (System.nanoTime() - t0) / 1e9
        }
        (median(ts), rows)
      } finally conf.set("spark.sql.adaptive.enabled", saved)
    }

    def legs(left: DataFrame): (Map[String, Double], Long) = {
      val (tPlainAqe, r1) = time(aqe = true)(left.join(right, Seq("key")))
      val (tSkewAqe, r2) = time(aqe = true)(left.skewJoin(right, Seq("key")))
      val (tPlainNoAqe, r3) = time(aqe = false)(left.join(right, Seq("key")))
      require(r1 == r2 && r2 == r3, s"row counts diverged: $r1 $r2 $r3")
      (Map("plain_aqe" -> tPlainAqe, "skewjoin_aqe" -> tSkewAqe,
        "plain_noaqe" -> tPlainNoAqe), r1)
    }

    // warm-up: one small pass per leg shape so JIT/codegen is steady
    locally {
      val wl = spark.range(10000).select((col("id") % 100).as("key"),
        payload(col("id")).as("pl")).localCheckpoint()
      val wr = spark.range(2000).select((col("id") % 100).as("key"),
        payload(col("id")).as("pr")).localCheckpoint()
      consume(wl.join(wr, Seq("key")))
      consume(wl.skewJoin(wr, Seq("key")))
    }

    val (skewT, skewRows) = legs(leftSide(hot = true))
    val (uniT, uniRows) = legs(leftSide(hot = false))

    def fmt(v: Double) = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    def m(t: Map[String, Double]) =
      t.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":${fmt(v)}""" }.mkString("{", ",", "}")
    spark.stop()
    println(s"""{"metric":"skew_wallclock","nLeft":$nLeft,"nKeys":$nKeys,"rightMult":$rightMult,"cpus":$cpus,"iters":$iters,"skew":${m(skewT)},"skew_rows":$skewRows,"uniform":${m(uniT)},"uniform_rows":$uniRows}""")
  }
}
