package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.skew.SkewJoin._
import graft.skew.{CrossSkew, LeftSkew, RightSkew, SkewJoinConf, SkewType}
import graft.testkit.DatasetComparisons._

/** Property-based equivalence (SURVEY §5 item 3): for random key
  * distributions (Zipf-ish hot keys, null rates, value duplication) and every
  * joinType/SkewType, skewJoin must equal the plain join as a row multiset.
  */
class SkewJoinPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val schema = StructType(Seq(
    StructField("k", LongType, nullable = true),
    StructField("v", StringType, nullable = true)))

  private def mkDf(rows: Seq[(Option[Long], String)]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (k, v) => Row(k.map(Long.box).orNull, v) }, 4),
      schema)

  private val genRows: Gen[Seq[(Option[Long], String)]] = for {
    n <- Gen.choose(0, 120)
    hotShare <- Gen.choose(0, 80)
    nullEvery <- Gen.choose(2, 10)
    rows <- Gen.listOfN(n, for {
      isHot <- Gen.choose(0, 99).map(_ < hotShare)
      k <- if (isHot) Gen.const(1L) else Gen.choose(1L, 12L)
      isNull <- Gen.choose(0, nullEvery).map(_ == 0)
      v <- Gen.alphaStr.map(_.take(4))
    } yield (if (isNull) None else Some(k), v))
  } yield rows

  private val genJoinType =
    Gen.oneOf("inner", "left_outer", "right_outer", "full_outer", "left_semi", "left_anti")
  private val genSkewType: Gen[SkewType] = Gen.oneOf(CrossSkew, LeftSkew, RightSkew)
  private val genRf = Gen.oneOf(1e-3, 0.05, 0.5, 1.0)

  test("skewJoin ≡ plain join over random keys, nulls, joinTypes, SkewTypes, factors") {
    val prop = Prop.forAll(genRows, genRows, genJoinType, genSkewType, genRf) {
      (lr, rr, jt, st, rf) =>
        val l = mkDf(lr)
        val r = mkDf(rr)
        val conf = SkewJoinConf(CMSeps = 1e-4, replicationFactor = rf, skewType = st)
        l.skewJoin(r, Seq("k"), jt, conf).ensureDatasetEquals(l.join(r, Seq("k"), jt))
        true
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12).withWorkers(1), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }
}
