package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewAgg
import graft.testkit.DatasetComparisons._

class SkewAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** One hot key (80% of rows, heavy value ties), cold keys, null values,
    * and a key whose values are all null. */
  private def data: DataFrame = {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val hot = (1 to 400).map(i => ("hot", Some(rng.nextInt(20).toLong)))
    val cold = (1 to 50).map(i => (s"k${i % 7}", Some(rng.nextInt(1000).toLong)))
    val nulls = Seq(("hot", None), ("k1", None), ("allnull", None), ("allnull", None))
    (hot ++ cold ++ nulls).toDF("k", "v").repartition(13)
  }

  test("sortedListAgg equals the single-stage sorted collect_list") {
    val want = data.filter(col("v").isNotNull).groupBy("k")
      .agg(sort_array(collect_list(col("v"))).as("values"))
      .withColumn("n_values", size(col("values")).cast("long"))
    SkewAgg.sortedListAgg(data, Seq("k"), "v").ensureDatasetEquals(want)
  }

  test("sortedListAgg result is independent of the salt count") {
    val a = SkewAgg.sortedListAgg(data, Seq("k"), "v", numSalts = 1)
    val b = SkewAgg.sortedListAgg(data, Seq("k"), "v", numSalts = 64)
    a.ensureDatasetEquals(b)
  }

  test("countDistinctExact equals count(DISTINCT) plus count(*)") {
    val want = data.groupBy("k").agg(
      countDistinct(col("v")).as("n_distinct"),
      count(lit(1)).as("n_rows"))
    SkewAgg.countDistinctExact(data, Seq("k"), "v").ensureDatasetEquals(want)
  }

  test("modePerKey picks the most frequent value, smallest value on ties") {
    import spark.implicits._
    val df = Seq(
      ("a", 3L), ("a", 3L), ("a", 1L), ("a", 1L), ("a", 2L), // tie 3↔1 → 1
      ("b", 9L),                                             // singleton
      ("c", 5L), ("c", 5L), ("c", 4L)                        // clear winner
    ).toDF("k", "v")
    val got = SkewAgg.modePerKey(df, Seq("k"), "v")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map("a" -> ((1L, 2L)), "b" -> ((9L, 1L)), "c" -> ((5L, 2L))))
  }

  test("all-null keys vanish from value-excluding aggregates, not from counts") {
    val lists = SkewAgg.sortedListAgg(data, Seq("k"), "v")
      .collect().map(r => r.getString(0)).toSet
    assert(!lists.contains("allnull"))
    val cd = SkewAgg.countDistinctExact(data, Seq("k"), "v")
      .filter(col("k") === "allnull")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(cd.toSeq == Seq((0L, 2L))) // 0 distinct values, 2 rows
  }
}
