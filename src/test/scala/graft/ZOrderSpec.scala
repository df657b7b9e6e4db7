package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ZOrder

class ZOrderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Bit-level reference: interleave bit b of column i at position b*n+i. */
  private def reference(vals: Seq[Long], bits: Int): Long = {
    val n = vals.size
    (for { (v, ci) <- vals.zipWithIndex; b <- 0 until bits }
      yield ((v >> b) & 1L) << (b * n + ci)).reduce(_ | _)
  }

  test("zValue matches the bit-interleave reference on exhaustive small grid") {
    import spark.implicits._
    val grid = for (a <- 0L until 16L; b <- 0L until 16L) yield (a, b)
    val got = grid.toDF("a", "b")
      .select(col("a"), col("b"),
        ZOrder.zValue(Seq(col("a"), col("b")), bits = 4).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    grid.foreach { case (a, b) =>
      assert(got((a, b)) == reference(Seq(a, b), 4), s"z($a,$b)")
    }
  }

  test("three-column interleave and bit-0-first positioning") {
    import spark.implicits._
    val df = Seq((1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L), (2L, 0L, 0L)).toDF("a", "b", "c")
    val got = df.select(ZOrder.zValue(Seq(col("a"), col("b"), col("c")), 2).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 2L, 4L, 8L)) // bit b of col i → position b*3+i
  }

  test("out-of-range and null inputs fail loudly instead of corrupting the curve") {
    import spark.implicits._
    val over = Seq((16L, 1L)).toDF("a", "b")
    intercept[Exception] {
      over.select(ZOrder.zValue(Seq(col("a"), col("b")), 4)).collect()
    }
    val neg = Seq((-1L, 1L)).toDF("a", "b")
    intercept[Exception] {
      neg.select(ZOrder.zValue(Seq(col("a"), col("b")), 4)).collect()
    }
    val withNull = Seq((Some(1L), None: Option[Long])).toDF("a", "b")
    intercept[Exception] {
      withNull.select(ZOrder.zValue(Seq(col("a"), col("b")), 4)).collect()
    }
  }

  test("z-order layout actually prunes a 2-D filtered parquet scan end-to-end") {
    import spark.implicits._
    import org.apache.spark.sql.execution.FileSourceScanExec
    // 64×64 grid → 16 files; the box filter selects ~1.6% of rows. With the
    // z layout every file covers a compact (a,b) rectangle, so parquet
    // row-group min/max stats skip all but the box's file(s); a round-robin
    // layout gives every file full-range stats and skips nothing.
    val rows = (for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b))
      .toDF("a", "b")
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder_prune")
    val zPath = s"$dir/zorder"
    val rrPath = s"$dir/roundrobin"
    ZOrder.layoutByZOrder(rows, Seq("a", "b"), bits = 6, numFiles = 16)
      .write.parquet(zPath)
    rows.repartition(16).write.parquet(rrPath)

    // rows the parquet reader actually DELIVERS (post row-group skipping),
    // read off the scan node's numOutputRows metric after execution
    def rowsRead(path: String): Long = {
      val q = spark.read.parquet(path)
        .filter(col("a") < 8 && col("b") < 8)
      q.collect()
      val scans = q.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s
      }
      assert(scans.nonEmpty, "no FileSourceScanExec in the executed plan")
      scans.map(_.metrics("numOutputRows").value).sum
    }
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val zRead = rowsRead(zPath)
      val rrRead = rowsRead(rrPath)
      assert(rrRead == 64L * 64, s"round-robin layout should read everything, read $rrRead")
      assert(zRead * 4 <= rrRead,
        s"z-order layout should prune most row groups: read $zRead of $rrRead")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("pruningAudit matches a brute-force stats simulation and ranks layouts correctly") {
    import spark.implicits._
    import graft.operators.ZOrder.pruningAudit
    val rng = new scala.util.Random(23)
    val rows = (1 to 4000).map(_ => (rng.nextInt(64).toLong, rng.nextInt(64).toLong))
    val bits = 6
    val filesLog2 = 4
    val shift = 2 * bits - filesLog2
    val box0 = (8L, 15L)
    val box1 = (40L, 47L)
    val got = pruningAudit(rows.toDF("a", "b"),
      org.apache.spark.sql.functions.col("a"),
      org.apache.spark.sql.functions.col("b"),
      bits, filesLog2, box0, box1)
      .collect().map(r => r.getString(0) -> (1 until 9).map(r.getLong).toSeq).toMap

    // brute force both layouts
    def audit(fileOf: (Long, Long) => Long): Seq[Long] = {
      val files = rows.groupBy { case (a, b) => fileOf(a, b) }.values.toSeq
      def stats(f: Seq[(Long, Long)]) =
        (f.size.toLong, f.map(_._1).min, f.map(_._1).max, f.map(_._2).min, f.map(_._2).max)
      val st = files.map(stats)
      def hit0(s: (Long, Long, Long, Long, Long)) = s._2 <= box0._2 && s._3 >= box0._1
      def hit1(s: (Long, Long, Long, Long, Long)) = s._4 <= box1._2 && s._5 >= box1._1
      Seq(st.size.toLong, st.map(_._1).sum,
        st.count(hit0).toLong, st.filter(hit0).map(_._1).sum,
        st.count(hit1).toLong, st.filter(hit1).map(_._1).sum,
        st.count(s => hit0(s) && hit1(s)).toLong,
        st.filter(s => hit0(s) && hit1(s)).map(_._1).sum)
    }
    def zOf(a: Long, b: Long) = reference(Seq(a, b), bits) >> shift
    def linOf(a: Long, b: Long) = ((a << bits) | b) >> shift
    assert(got("zorder") == audit(zOf))
    assert(got("linear") == audit(linOf))
    // the structural story: linear cannot prune d1-only probes at all,
    // z-order prunes both dimensions
    assert(got("linear")(4) == got("linear")(0), "linear must read every file for d1")
    assert(got("zorder")(4) < got("zorder")(0), "zorder must prune d1 probes")
  }

  test("layoutByZOrder yields disjoint, file-prunable z-ranges per partition") {
    import spark.implicits._
    val rows = for (a <- 0L until 32L; b <- 0L until 32L) yield (a, b)
    val laid = ZOrder.layoutByZOrder(
      rows.toDF("a", "b").repartition(7), Seq("a", "b"), bits = 5, numFiles = 4)
    // recompute z over the laid-out frame; each partition's [min,max] span
    // must not overlap any other's — that is exactly the property parquet
    // min/max stats need for pruning
    val spans = laid
      .select(spark_partition_id().as("pid"),
        ZOrder.zValue(Seq(col("a"), col("b")), 5).as("z"))
      .groupBy("pid").agg(min("z").as("lo"), max("z").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(spans.nonEmpty)
    spans.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2, s"overlap: $hi1 vs $lo2")
      case _ =>
    }
    // and no rows were lost or duplicated by the re-layout
    assert(laid.count() == rows.size)
  }
}
