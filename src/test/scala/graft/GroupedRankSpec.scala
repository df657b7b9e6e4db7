package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GroupedRank
import graft.testkit.DatasetComparisons._

class GroupedRankSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def skewed = {
    import spark.implicits._
    // one dominant group + small groups + a singleton, values with ties on
    // the first order column so the tiebreaker matters
    ((1 to 5000).map(i => ("hot", i % 97, i)) ++
      (1 to 40).map(i => ("warm", i % 7, i)) ++
      Seq(("one", 0, 1)))
      .toDF("g", "v", "id").repartition(8)
  }

  test("withGroupRank equals row_number over a per-group window") {
    val got = GroupedRank.withGroupRank(
      skewed, Seq("g"), Seq(col("v"), col("id")), "r")
    val w = Window.partitionBy("g").orderBy(col("v"), col("id"))
    val want = skewed.withColumn("r", row_number().over(w).cast("long"))
    got.ensureDatasetEquals(want)
  }

  test("withGroupNtile is bit-identical to the ntile window for several k") {
    Seq(1, 3, 4, 7, 6000).foreach { k =>
      val got = GroupedRank.withGroupNtile(
        skewed, Seq("g"), Seq(col("v"), col("id")), k, "q")
      val w = Window.partitionBy("g").orderBy(col("v"), col("id"))
      val want = skewed.withColumn("q", ntile(k).over(w))
      withClue(s"k=$k: ") { got.ensureDatasetEquals(want) }
    }
  }

  test("AQE on (with coalescing) leaves ranks and ntiles bit-identical to the window forms") {
    // six production queries sit on this operator, and its correctness
    // depends on the counts branch and the join branch reading ONE physical
    // range exchange; AQE replans exchanges at runtime (stage reuse +
    // partition coalescing), so pin that the default-on production setting
    // cannot split the shared exchange into two independently-sampled ones
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      // force coalescing to actually engage on the tiny test exchange
      "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64m")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val got = GroupedRank.withGroupRank(
        skewed, Seq("g"), Seq(col("v"), col("id")), "r")
      val w = Window.partitionBy("g").orderBy(col("v"), col("id"))
      val want = skewed.withColumn("r", row_number().over(w).cast("long"))
      got.ensureDatasetEquals(want)
      val gotN = GroupedRank.withGroupNtile(
        skewed, Seq("g"), Seq(col("v"), col("id")), 7, "q")
      val wantN = skewed.withColumn("q", ntile(7).over(w))
      gotN.ensureDatasetEquals(wantN)
      // the global-rank form (empty groupCols) under AQE too
      val gotG = GroupedRank.withGroupRank(
        skewed, Nil, Seq(col("v"), col("id"), col("g")), "r")
      val wantG = skewed.withColumn("r",
        row_number().over(Window.orderBy(col("v"), col("id"), col("g"))).cast("long"))
      gotG.ensureDatasetEquals(wantG)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("no per-group single-task sort: every window partitions on the physical pid") {
    val got = GroupedRank.withGroupNtile(
      skewed, Seq("g"), Seq(col("v"), col("id")), 4, "q")
    val plan = got.queryExecution.executedPlan.toString
    // the data-sized exchange is the RANGE repartition; the only
    // hashpartitioning over bare group columns may carry aggregates
    // (tiny), never Window sorts — i.e. no "Window ... partitionBy(g)"
    // without the pid column
    assert(plan.contains("rangepartitioning"),
      s"expected a range exchange in:\n$plan")
    val windowLines = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windowLines.nonEmpty)
    windowLines.foreach { l =>
      assert(l.contains("__graft_pid") || !l.contains("row_number"),
        s"a row_number window does not include the physical pid: $l")
    }
  }

  test("NULL group keys rank and bucket like any other group (null-safe joins)") {
    import spark.implicits._
    val df = Seq(
      (Some("a"), 3), (Some("a"), 1), (None, 2), (None, 5), (None, 1), (Some("b"), 7)
    ).map { case (g, v) => (g.orNull, v) }.toDF("g", "v")
    val got = GroupedRank.withGroupRank(df, Seq("g"), Seq(col("v")), "r")
    val w = Window.partitionBy("g").orderBy("v")
    val want = df.withColumn("r", row_number().over(w).cast("long"))
    got.ensureDatasetEquals(want) // the NULL group must NOT be dropped
    assert(got.filter(col("g").isNull).count() == 3)
    val nt = GroupedRank.withGroupNtile(df, Seq("g"), Seq(col("v")), 2, "q")
    nt.ensureDatasetEquals(df.withColumn("q", ntile(2).over(w)))
  }

  test("empty groupCols gives a scale-safe global rank") {
    import spark.implicits._
    val df = (1 to 2000).map(i => (i.toLong, (i * 37 % 1999).toLong))
      .toDF("id", "key").repartition(8)
    val got = GroupedRank.withGroupRank(df, Seq(), Seq(col("key"), col("id")), "r")
    val w = Window.orderBy(col("key"), col("id"))
    val want = df.withColumn("r", row_number().over(w).cast("long"))
    got.ensureDatasetEquals(want)
    // ntile with no groups works via the cross-joined totals
    val nt = GroupedRank.withGroupNtile(df, Seq(), Seq(col("key"), col("id")), 4, "q")
    val wantNt = df.withColumn("q", ntile(4).over(w))
    nt.ensureDatasetEquals(wantNt)
  }

  test("multi-column groups and empty input") {
    import spark.implicits._
    val df = Seq(("a", "x", 3), ("a", "x", 1), ("a", "y", 2), ("b", "x", 9))
      .toDF("g1", "g2", "v")
    val got = GroupedRank.withGroupRank(df, Seq("g1", "g2"), Seq(col("v")), "r")
    val w = Window.partitionBy("g1", "g2").orderBy("v")
    got.ensureDatasetEquals(df.withColumn("r", row_number().over(w).cast("long")))
    val empty = df.filter(lit(false))
    assert(GroupedRank.withGroupNtile(empty, Seq("g1"), Seq(col("v")), 4).count() == 0)
  }

  test("withGroupPercentile: 0 for smallest, 1e6 for largest, 0 for singletons") {
    import spark.implicits._
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L), ("a", 5L),
      ("b", 7L)).toDF("g", "v")
    val got = GroupedRank.withGroupPercentile(df, Seq("g"), Seq(col("v")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      ("a", 1L, 0L), ("a", 2L, 250000L), ("a", 3L, 500000L),
      ("a", 4L, 750000L), ("a", 5L, 1000000L),
      ("b", 7L, 0L)))
  }
}
