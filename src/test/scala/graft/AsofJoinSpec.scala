package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsofJoin
import graft.testkit.DatasetComparisons._

class AsofJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def leftDf: DataFrame = {
    import spark.implicits._
    Seq(
      // (id, key, t)
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 5L),
      (4L, "b", 100L), (5L, "b", 1L),
      (6L, "c", 50L),                       // key with no right rows
      (7L, "a", 15L)
    ).toDF("l_id", "k", "t")
  }

  private def rightDf: DataFrame = {
    import spark.implicits._
    Seq(
      // (rid, key, rt, v)
      (101L, "a", 8L, 1.5), (102L, "a", 15L, 2.5), (103L, "a", 30L, 3.5),
      (104L, "b", 90L, 4.5), (105L, "b", 200L, 5.5)
    ).toDF("r_id", "k", "rt", "v")
  }

  /** Independent reference: range join + per-left-row argmax window. The
    * quadratic formulation asofJoin exists to avoid — correct at test scale. */
  private def reference(l: DataFrame, r: DataFrame, dir: String): DataFrame = {
    val cond = col("l.k") === col("r.k") &&
      (if (dir == "backward") col("r.rt") <= col("l.t") else col("r.rt") >= col("l.t"))
    val ord =
      if (dir == "backward") Seq(col("rt").desc, col("r_id").desc)
      else Seq(col("rt").asc, col("r_id").desc)
    val w = Window.partitionBy("l_id").orderBy(ord: _*)
    l.as("l").join(r.as("r"), cond, "left")
      .select(col("l.l_id"), col("l.k"), col("l.t"),
        col("r.r_id"), col("r.rt"), col("r.v"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  test("backward asof matches the range-join + argmax reference") {
    val got = AsofJoin.asofJoin(leftDf, rightDf, Seq("k"), "t", "rt",
      tieBreakCol = Some("r_id"))
      .select("l_id", "k", "t", "r_id", "rt", "v")
    got.ensureDatasetEquals(reference(leftDf, rightDf, "backward"))
  }

  test("forward asof matches the reference") {
    val got = AsofJoin.asofJoin(leftDf, rightDf, Seq("k"), "t", "rt",
      direction = "forward", tieBreakCol = Some("r_id"))
      .select("l_id", "k", "t", "r_id", "rt", "v")
    got.ensureDatasetEquals(reference(leftDf, rightDf, "forward"))
  }

  test("equal timestamps match inclusively") {
    val out = AsofJoin.asofJoin(leftDf, rightDf, Seq("k"), "t", "rt")
      .filter(col("l_id") === 7L).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("r_id") == 102L) // rt == t == 15 matches
  }

  test("inner drops unmatched; left keeps them with nulls") {
    val left = AsofJoin.asofJoin(leftDf, rightDf, Seq("k"), "t", "rt")
    val inner = AsofJoin.asofJoin(leftDf, rightDf, Seq("k"), "t", "rt",
      joinType = "inner")
    assert(left.count() == 7)
    // l_id 3 (t=5 before any right 'a'), 5 (t=1), 6 (key 'c') are unmatched
    assert(inner.select("l_id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 4L, 7L))
    val unmatched = left.filter(col("r_id").isNull)
      .collect().map(_.getAs[Long]("l_id")).sorted.toSeq
    assert(unmatched == Seq(3L, 5L, 6L))
  }

  test("right rows tied on (key, time) resolve to the greatest tieBreak") {
    import spark.implicits._
    val l = Seq((1L, "a", 10L)).toDF("l_id", "k", "t")
    val r = Seq((7L, "a", 10L, 1.0), (9L, "a", 10L, 2.0), (8L, "a", 10L, 3.0))
      .toDF("r_id", "k", "rt", "v")
    val out = AsofJoin.asofJoin(l, r, Seq("k"), "t", "rt",
      tieBreakCol = Some("r_id")).collect()
    assert(out(0).getAs[Long]("r_id") == 9L)
  }

  test("null times: left matches nothing, right rows never match") {
    import spark.implicits._
    val l = Seq((1L, "a", Some(10L)), (2L, "a", None)).toDF("l_id", "k", "t")
    val r = Seq((7L, "a", Some(5L), 1.0), (8L, "a", None, 2.0))
      .toDF("r_id", "k", "rt", "v")
    val out = AsofJoin.asofJoin(l, r, Seq("k"), "t", "rt")
      .collect().map(x => x.getAs[Long]("l_id") -> Option(x.getAs[Any]("r_id"))).toMap
    assert(out(1L) == Some(7L))
    assert(out(2L) == None)
  }

  test("matched right row with all-null value columns survives inner join") {
    import spark.implicits._
    val l = Seq((1L, "a", 10L)).toDF("l_id", "k", "t")
    val r = Seq(("a", 5L, None: Option[Double])).toDF("k", "rt", "v")
    val inner = AsofJoin.asofJoin(l, r, Seq("k"), "t", "rt", joinType = "inner")
    assert(inner.count() == 1)
  }

  test("plan has exactly one shuffle by key and no join node") {
    val out = AsofJoin.asofJoin(leftDf, rightDf, Seq("k"), "t", "rt")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"asof plan must not contain a join:\n$plan")
    // window + union: one hashpartitioning exchange on the key
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 key exchange, got $exchanges:\n$plan")
  }
}
