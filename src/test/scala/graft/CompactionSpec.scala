package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Compaction

/** [[Compaction.planBinPack]] — the prefix-sum next-fit rule, the
  * bin-size bound, per-partition independence, and the loud negative-size
  * guard. */
class CompactionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def plan(rows: Seq[(String, Long, Long)], target: Long) = {
    import spark.implicits._
    Compaction.planBinPack(
      rows.toDF("p", "fid", "sz"), Seq("p"), "fid", "sz", target)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
  }

  test("hand-checked bins: prefix-sum rule, boundary file starts the next bin") {
    // sizes 60, 60, 30, 100 at target 100: prefixes 0,60,120,150 →
    // bins 0,0,1,1; totals bin0=120, bin1=130
    val got = plan(Seq(("a", 1L, 60L), ("a", 2L, 60L),
      ("a", 3L, 30L), ("a", 4L, 100L)), target = 100L)
    assert(got(("a", 1L)) == ((0L, 120L, 2L)))
    assert(got(("a", 2L)) == ((0L, 120L, 2L)))
    assert(got(("a", 3L)) == ((1L, 130L, 2L)))
    assert(got(("a", 4L)) == ((1L, 130L, 2L)))
  }

  test("partitions pack independently; oversized single files get their own bin span") {
    val got = plan(Seq(("a", 1L, 500L), ("a", 2L, 10L),
      ("b", 1L, 10L), ("b", 2L, 10L)), target = 100L)
    // a: file1 prefix 0 → bin 0; file2 prefix 500 → bin 5
    assert(got(("a", 1L))._1 == 0L && got(("a", 2L))._1 == 5L)
    // b packs both tiny files into bin 0
    assert(got(("b", 1L))._1 == 0L && got(("b", 2L))._1 == 0L)
  }

  test("next-fit bound: every bin total < target + its largest file") {
    import spark.implicits._
    val rng = new scala.util.Random(31)
    val rows = for (p <- Seq("x", "y"); i <- 1 to 80)
      yield (p, i.toLong, 1L + rng.nextInt(120).toLong)
    val out = Compaction.planBinPack(
      rows.toDF("p", "fid", "sz"), Seq("p"), "fid", "sz", targetBytes = 100L)
      .collect()
    out.groupBy(r => (r.getString(0), r.getLong(3))).foreach { case (_, bs) =>
      val total = bs.head.getLong(4)
      val maxFile = bs.map(_.getLong(2)).max
      assert(total < 100L + maxFile,
        s"bin total $total breaks the next-fit bound (max file $maxFile)")
    }
    // conservation: every file appears exactly once
    assert(out.length == rows.length)
  }

  test("negative file size fails loudly") {
    intercept[Exception](plan(Seq(("a", 1L, -5L)), 100L))
  }

  test("duplicate file ids stay deterministic: size is the tie-break sort key") {
    // two rows share (partition, file id) with different sizes — the
    // size-ascending tie order makes prefixes (0, 20, 110) regardless of
    // arrival order, so bins are a pure function of the data
    import spark.implicits._
    val rows = Compaction.planBinPack(
      Seq(("a", 1L, 90L), ("a", 1L, 20L), ("a", 2L, 50L))
        .toDF("p", "fid", "sz"), Seq("p"), "fid", "sz", 100L)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(rows == Set((1L, 20L, 0L), (1L, 90L, 0L), (2L, 50L, 1L)),
      s"got $rows")
  }
}
