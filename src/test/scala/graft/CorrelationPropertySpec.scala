package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Correlation

/** Property pin for [[Correlation.corrMatrixExact]] against an
  * independent BigInt reference: for ANY integral data (including values
  * large enough that a long×long moment product would wrap — the review
  * finding the decimal-before-multiply fix closed), the operator's
  * corr_sign and two-step-division r2_ppm must equal the exact BigInt
  * replay, and r2_ppm must sit in [0, 10⁶] by Cauchy–Schwarz. Seeded. */
class CorrelationPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val genCase: Gen[Seq[(Long, Long)]] = for {
    n <- Gen.choose(2, 25)
    // mix magnitudes: plain small values and ±4e9-scale ones whose square
    // exceeds Long.MaxValue (the wrap regime the decimal cast must survive)
    rows <- Gen.listOfN(n, for {
      x <- Gen.oneOf(Gen.choose(-40L, 40L), Gen.choose(-4000000000L, 4000000000L))
      y <- Gen.oneOf(Gen.choose(-40L, 40L), Gen.choose(-4000000000L, 4000000000L))
    } yield (x, y))
  } yield rows

  test("corr_sign and r2_ppm equal the BigInt reference, wrap-regime included (property)") {
    import spark.implicits._
    val prop = Prop.forAll(genCase) { rows =>
      val r = Correlation.corrMatrixExact(rows.toDF("x", "y"), Seq("x", "y"))
        .collect().head
      val n = BigInt(rows.size)
      val sx = rows.map(t => BigInt(t._1)).sum
      val sy = rows.map(t => BigInt(t._2)).sum
      val sxx = rows.map(t => BigInt(t._1) * t._1).sum
      val syy = rows.map(t => BigInt(t._2) * t._2).sum
      val sxy = rows.map(t => BigInt(t._1) * t._2).sum
      val cov = n * sxy - sx * sy
      val vx = n * sxx - sx * sx
      val vy = n * syy - sy * sy
      assert(r.getLong(3) == cov.signum.toLong,
        s"sign: rows=$rows got=${r.getLong(3)} want=${cov.signum}")
      if (vx == 0 || vy == 0) assert(r.isNullAt(4), s"rows=$rows: want NULL r2")
      else {
        val want = ((cov.abs * 1000) / vx) * ((cov.abs * 1000) / vy)
        assert(!r.isNullAt(4) && r.getLong(4) == want.toLong,
          s"r2: rows=$rows got=${r.getLong(4)} want=$want")
        assert(want >= 0 && want <= 1000000,
          s"Cauchy–Schwarz bound violated: $want")
      }
      true
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30)
        .withInitialSeed(Seed(20260815L)), prop)
    assert(res.passed, res.status.toString)
  }
}
