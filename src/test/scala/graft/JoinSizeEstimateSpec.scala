package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sketch.JoinSizeEstimate

class JoinSizeEstimateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // driver-side bit-exact replay of the estimator: per-depth CM counters
  // from the same hash, inner products, min
  private def refEstimate(left: Seq[Long], right: Seq[Long],
      depth: Int, width: Int, seed: Long): (Seq[Long], Long) = {
    val coeffs = JoinSizeEstimate.coefficients(depth, seed)
    val m = JoinSizeEstimate.Modulus
    def cms(keys: Seq[Long]): Array[Array[Long]] = {
      val c = Array.fill(depth, width)(0L)
      keys.foreach { k =>
        coeffs.zipWithIndex.foreach { case ((a, b), i) =>
          val bucket = (((k % m + m) % m) * a + b) % m % width
          c(i)(bucket.toInt) += 1
        }
      }
      c
    }
    val (lc, rc) = (cms(left), cms(right))
    val ips = (0 until depth).map { i =>
      (0 until width).map(j => lc(i)(j) * rc(i)(j)).sum
    }
    (ips, ips.min)
  }

  private def trueJoinSize(left: Seq[Long], right: Seq[Long]): Long = {
    val rCounts = right.groupBy(identity).view.mapValues(_.size.toLong).toMap
    left.map(k => rCounts.getOrElse(k, 0L)).sum
  }

  test("Spark inner products replay the reference CMS bit-exactly; min is an upper bound") {
    import spark.implicits._
    val rng = new scala.util.Random(3)
    // zipf-ish multiplicities so the join has real key blowup
    val left = (1 to 800).map(_ => (rng.nextInt(rng.nextInt(40) + 1) + 1).toLong)
    val right = (1 to 600).map(_ => (rng.nextInt(rng.nextInt(60) + 1) + 1).toLong)
    val (depth, width, seed) = (4, 32, 99L) // small width FORCES collisions
    val (refIps, refMin) = refEstimate(left, right, depth, width, seed)

    val ips = JoinSizeEstimate.innerProducts(
      left.toDF("k"), "k", right.toDF("k"), "k", depth, width, seed)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(ips == refIps.zipWithIndex.map { case (v, i) => i -> v }.toMap)

    val est = JoinSizeEstimate.estimate(
      left.toDF("k"), "k", right.toDF("k"), "k", depth, width, seed)
      .collect().head.getLong(0)
    assert(est == refMin)
    assert(est >= trueJoinSize(left, right),
      "CM inner product must never underestimate the join size")
  }

  test("with ample width the estimate lands on the exact join size") {
    import spark.implicits._
    val left = (1L to 200L) ++ (1L to 50L) // keys 1..50 doubled
    val right = (1L to 100L).map(k => k % 25 + 1)
    val est = JoinSizeEstimate.estimate(
      left.toDF("k"), "k", right.toDF("k"), "k",
      depth = 5, width = 65536, seed = 42L)
      .collect().head.getLong(0)
    assert(est == trueJoinSize(left, right))
  }

  test("negative keys hash into range (pmod) and match the reference") {
    import spark.implicits._
    val left = Seq(-5L, -5L, -1L, 3L, Long.MinValue + 7L)
    val right = Seq(-5L, 3L, 3L, -7L)
    val (refIps, refMin) = refEstimate(left, right, 3, 16, 7L)
    val est = JoinSizeEstimate.estimate(
      left.toDF("k"), "k", right.toDF("k"), "k", 3, 16, 7L)
      .collect().head.getLong(0)
    assert(est == refMin)
    assert(refIps.forall(_ >= trueJoinSize(left, right)))
  }
}
