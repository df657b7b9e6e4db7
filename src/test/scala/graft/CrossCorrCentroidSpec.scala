package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CrossCorr
import graft.llm.Quantize

/** [[CrossCorr.leadLagMatrix]] against a driver-side brute-force
  * reference, and [[Quantize.centroidSimilarity]] against hand-built
  * geometry (parallel / orthogonal / anti-parallel clouds). */
class CrossCorrCentroidSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("leadLagMatrix: a 2-day-shifted copy peaks exactly at lag 2") {
    import spark.implicits._
    // series a on days 0..9 with a spike at day 3; series b = a shifted +2
    val a = Seq.tabulate(10)(d => ("a", d.toLong, if (d == 3) 50L else 1L))
    val b = a.map { case (_, d, y) => ("b", d + 2L, y) }
    val df = (a ++ b).flatMap { case (k, d, y) =>
      Seq.fill(y.toInt)((k, d)) // one row per unit so yCol=1 counts work
    }.toDF("k", "d")
    val got = CrossCorr.leadLagMatrix(df, "k", col("d"), lit(1L), maxLag = 3)
      .collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    // span is days 0..11 (12 days); lag ℓ aligns m = 12 − |ℓ| days
    assert(got.map(g => (g._1, g._2)).toSeq ==
      Seq((-3L, 9L), (-2L, 10L), (-1L, 11L), (0L, 12L),
        (1L, 11L), (2L, 10L), (3L, 9L)))
    val byLag = got.map(g => g._1 -> g._3).toMap
    // the spike alignment: cov at lag 2 dominates every other lag
    assert(byLag(2L) == byLag.values.max,
      s"expected peak at lag 2, got $byLag")
    assert(byLag(2L) > 0 && byLag(-3L) < byLag(2L))
  }

  test("leadLagMatrix equals a driver-side brute-force on random series") {
    import spark.implicits._
    val rng = new scala.util.Random(3)
    val rows = for {
      k <- Seq("p", "q", "r"); d <- 0 until 15
      n = rng.nextInt(4)
      _ <- 0 until n
    } yield (k, d.toLong)
    val df = rows.toDF("k", "d")
    val got = CrossCorr.leadLagMatrix(df, "k", col("d"), lit(1L), maxLag = 2)
      .collect()
      .map(r => ((r.getString(0), r.getString(1), r.getLong(2)),
        (r.getLong(3), r.getLong(4)))).toMap
    // brute force: dense counts on the global span, all pairs and lags
    val counts = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (mn, mx) = (rows.map(_._2).min, rows.map(_._2).max)
    def series(k: String) =
      (mn to mx).map(d => counts.getOrElse((k, d), 0L))
    for {
      (ka, kb) <- Seq(("p", "q"), ("p", "r"), ("q", "r")); lag <- -2L to 2L
    } {
      val (sa, sb) = (series(ka), series(kb))
      val pairs = (mn to mx).flatMap { d =>
        val db = d + lag
        if (db >= mn && db <= mx) Some((sa((d - mn).toInt), sb((db - mn).toInt)))
        else None
      }
      val m = pairs.size.toLong
      val cov = m * pairs.map(p => p._1 * p._2).sum -
        pairs.map(_._1).sum * pairs.map(_._2).sum
      assert(got((ka, kb, lag)) == ((m, cov)),
        s"($ka,$kb,$lag): got ${got((ka, kb, lag))}, want ($m,$cov)")
    }
  }

  test("centroidSimilarity: parallel, orthogonal, and anti-parallel clouds") {
    import spark.implicits._
    // 4-dim clouds: A along +e1, B along +e1 (parallel to A),
    // C along +e2 (orthogonal), D along −e1 (anti-parallel)
    val rows = Seq(
      ("A", Seq(1.0f, 0f, 0f, 0f)), ("A", Seq(0.5f, 0f, 0f, 0f)),
      ("B", Seq(0.75f, 0f, 0f, 0f)),
      ("C", Seq(0f, 1.0f, 0f, 0f)),
      ("D", Seq(-1.0f, 0f, 0f, 0f)))
    val df = rows.toDF("label", "embedding")
    val got = Quantize.centroidSimilarity(df, "label", "embedding")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(7)) None else Some(r.getLong(7)))).toMap
    assert(got(("A", "B")) == Some(1000000L)) // parallel → +1e6 exactly
    assert(got(("A", "C")) == Some(0L))       // orthogonal → 0
    assert(got(("A", "D")) == Some(-1000000L)) // anti-parallel → −1e6
    assert(got(("C", "D")) == Some(0L))
  }

  test("centroidSimilarity: exact integer means and norms on a hand case") {
    import spark.implicits._
    // A: mean of (1,0) and (0.5,0) → q sums 4096+2048=6144, n=2 → m=(3072,0)
    // B: (0.25, 0.25) → m=(1024,1024)
    val df = Seq(
      ("A", Seq(1.0f, 0f)), ("A", Seq(0.5f, 0f)),
      ("B", Seq(0.25f, 0.25f))).toDF("label", "embedding")
    val r = Quantize.centroidSimilarity(df, "label", "embedding").head()
    assert((r.getString(0), r.getString(1)) == (("A", "B")))
    assert(r.getLong(2) == 2L && r.getLong(3) == 1L) // n_a, n_b
    assert(r.getLong(4) == 3072L * 1024L)            // dot_q
    assert(r.getLong(5) == 3072L * 3072L)            // norm_a_q
    assert(r.getLong(6) == 2L * 1024L * 1024L)       // norm_b_q
    // cos² = dot²/(na·nb) = (3072·1024)²/(3072²·2·1024²) = 1/2 → 500000
    assert(r.getLong(7) == 500000L)
  }
}
