package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Quantize

class GramMatrixSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("matches the driver-side rank-1 sum on random vectors, any partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val dim = 7
    val vecs = (1 to 400).map(_ => Array.fill(dim)(rnd.nextFloat() * 2 - 1))
    // reference: quantize per row, sum in longs
    val want = Array.ofDim[Long](dim, dim)
    vecs.foreach { v =>
      val d = v.map(_.toDouble)
      for (i <- 0 until dim; j <- i until dim)
        want(i)(j) += math.floor(d(i) * d(j) * 16777216.0).toLong
    }
    for (parts <- Seq(1, 7)) {
      val df = vecs.map(v => Tuple1(v.toSeq)).toDF("embedding")
        .repartition(parts)
      val got = Quantize.gramMatrix(df, "embedding", dim)
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3))))
        .toMap
      assert(got.size == dim * (dim + 1) / 2)
      for (i <- 0 until dim; j <- i until dim)
        assert(got((i + 1, j + 1)) == ((want(i)(j), 400L)),
          s"diverges at ($i,$j) with $parts partitions")
    }
  }

  test("null vectors are skipped; wrong dimension throws") {
    import spark.implicits._
    val df = Seq(Some(Seq(1.0f, 2.0f)), None, Some(Seq(0.5f, -1.0f)))
      .toDF("embedding")
    val got = Quantize.gramMatrix(df, "embedding", 2)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val gotN = Quantize.gramMatrix(df, "embedding", 2)
      .select("n").head().getLong(0)
    assert(gotN == 2L)
    def q(x: Double) = math.floor(x * 16777216.0).toLong
    assert(got((1, 1)) == q(1.0) + q(0.25))
    assert(got((1, 2)) == q(2.0) + q(-0.5))
    assert(got((2, 2)) == q(4.0) + q(1.0))
    val bad = Seq(Seq(1.0f, 2.0f, 3.0f)).toDF("embedding")
    val e = intercept[Exception] {
      Quantize.gramMatrix(bad, "embedding", 2).collect()
    }
    assert(e.getMessage != null)
  }
}
