package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GroupedRank
import graft.testkit.DatasetComparisons._

/** Property-based equivalence for the distributed rank: for random group
  * skews, null-group rates, duplicate order values (ties), bucket counts,
  * and partitionings, withGroupRank/withGroupNtile must equal the
  * per-group window formulations exactly. GroupedRank now underlies
  * events_ntile, group quantiles, corpus shuffling, budget selection, and
  * length batching — a silent divergence here corrupts six queries. */
class GroupedRankPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val schema = StructType(Seq(
    StructField("g", StringType, nullable = true),
    StructField("v", LongType, nullable = false),
    StructField("id", LongType, nullable = false)))

  private def mkDf(rows: Seq[(Option[String], Long, Long)], parts: Int) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (g, v, id) => Row(g.orNull, Long.box(v), Long.box(id)) },
        math.max(parts, 1)),
      schema)

  private val genCase: Gen[(Seq[(Option[String], Long, Long)], Int, Int)] = for {
    n <- Gen.choose(0, 200)
    hotShare <- Gen.choose(0, 90)
    nullEvery <- Gen.choose(2, 12)
    valueRange <- Gen.oneOf(3L, 10L, 1000L) // small range → many ties
    parts <- Gen.choose(1, 9)
    k <- Gen.choose(1, 9)
    rows <- Gen.listOfN(n, for {
      isHot <- Gen.choose(0, 99).map(_ < hotShare)
      g <- if (isHot) Gen.const("hot") else Gen.oneOf("a", "b", "c", "d")
      isNull <- Gen.choose(0, nullEvery).map(_ == 0)
      v <- Gen.choose(0L, valueRange)
    } yield (if (isNull) None else Some(g), v))
  } yield (rows.zipWithIndex.map { case ((g, v), i) => (g, v, i.toLong) }, parts, k)

  test("withGroupRank/withGroupNtile ≡ window forms for random shapes (property)") {
    val prop = Prop.forAll(genCase) { case (rows, parts, k) =>
      val df = mkDf(rows, parts)
      val w = Window.partitionBy("g").orderBy(col("v"), col("id"))
      val gotRank = GroupedRank.withGroupRank(df, Seq("g"), Seq(col("v"), col("id")), "r")
      val wantRank = df.withColumn("r", row_number().over(w).cast("long"))
      gotRank.ensureDatasetEquals(wantRank)
      val gotNt = GroupedRank.withGroupNtile(df, Seq("g"), Seq(col("v"), col("id")), k, "q")
      val wantNt = df.withColumn("q", ntile(k).over(w))
      gotNt.ensureDatasetEquals(wantNt)
      true
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }
}
