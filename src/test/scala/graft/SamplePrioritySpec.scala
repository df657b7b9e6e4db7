package graft

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.DatasetComparisons._
import graft.llm.Sampling

class SamplePrioritySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // driver-side replica of the portable sampling hash: 60-bit md5 prefix
  // of (id || salt), mod 1e6
  private def bucket(id: Long, salt: String): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest((id.toString + salt).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % 1000000L
  }

  test("matches the brute-force priority ranking per stratum") {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    val rows = (0L until 400L).map(i =>
      (i, s"src${i % 3}", rng.nextInt(500).toLong + 1L))
    val got = Sampling.samplePriority(rows.toDF("id", "src", "w"),
        "id", "src", "w", k = 10, salt = ":t")
      .select("id", "src", "sample_rank")
      .collect().map(r => (r.getString(1), r.getLong(2)) -> r.getLong(0)).toMap
    val expect = rows.groupBy(_._2).flatMap { case (src, rs) =>
      rs.map { case (id, _, w) =>
          (id, w.toDouble * 1000000.0 / (bucket(id, ":t") + 1L).toDouble)
        }
        .sortBy { case (id, pri) => (-pri, id) }
        .take(10).zipWithIndex
        .map { case ((id, _), i) => (src, i + 1L) -> id }
    }
    assert(got == expect)
  }

  test("k bounds each stratum; smaller strata contribute all rows") {
    import spark.implicits._
    val rows = (0L until 50L).map(i => (i, if (i < 45) "big" else "tiny", i + 1L))
    val got = Sampling.samplePriority(rows.toDF("id", "src", "w"),
      "id", "src", "w", k = 8)
    val bySrc = got.groupBy("src").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc == Map("big" -> 8L, "tiny" -> 5L))
  }

  test("deterministic under repartitioning and membership is weight-biased") {
    import spark.implicits._
    // half the rows carry weight 1000, half weight 1: the heavy rows should
    // dominate a k=20 sample of 200 (non-flaky: deterministic hash, and the
    // priority gap is 3 orders of magnitude)
    val rows = (0L until 200L).map(i =>
      (i, "s", if (i % 2 == 0) 1000L else 1L))
    val df = rows.toDF("id", "src", "w")
    val a = Sampling.samplePriority(df, "id", "src", "w", k = 20)
    val b = Sampling.samplePriority(df.repartition(11), "id", "src", "w", k = 20)
    a.ensureDatasetEquals(b)
    val heavy = a.filter("w = 1000").count()
    assert(heavy >= 18, s"heavy-weight rows in sample: $heavy of 20")
  }
}
