package graft

import org.apache.spark.sql.functions.{col, lit}

class BloomOpsSpec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.sketch.BloomOps
  import graft.testkit.DatasetComparisons._
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("bloom-prefiltered join equals the plain join exactly") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val urgent = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("l_orderkey"), col("o_custkey"))
    BloomOps.bloomPrefilteredJoin(li, urgent, Seq("l_orderkey"))
      .ensureDatasetEquals(li.join(urgent, Seq("l_orderkey"), "inner"))
  }

  test("the prefilter prunes most non-matching big-side rows") {
    import spark.implicits._
    val big = (1L to 10000L).toDF("k")
    val small = (1L to 100L).toDF("k")
    val bloom = BloomOps.bloomOf(small, Seq("k"), expectedItems = 1000L)
    val kept = big.filter(BloomOps.mightContain(bloom, Seq(col("k")))).count()
    // no false negatives, and false positives are rare at this sizing
    assert(kept >= 100 && kept < 500, s"kept $kept of 10000")
  }

  test("join types that keep unmatched big-side rows are rejected") {
    import spark.implicits._
    val df = Seq(1L).toDF("k")
    intercept[IllegalArgumentException] {
      BloomOps.bloomPrefilteredJoin(df, df, Seq("k"), joinType = "left_outer")
    }
    // and the safe spellings are accepted
    assert(BloomOps.bloomPrefilteredJoin(df, df, Seq("k"), joinType = "left_semi")
      .count() == 1L)
  }
}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sketch.CmsOps

class CmsOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("CMS estimates are never under the true count and bounded above (Zipf keys)") {
    import spark.implicits._
    // Zipf-ish: key i appears ~ N/i times.
    val rows = (1 to 50).flatMap(i => Seq.fill(2000 / i)(s"key_$i"))
    val df = rows.toDF("k").repartition(8)
    val n = rows.size
    val cms = CmsOps.cmsOf(df, col("k"), eps = 0.005, delta = 1e-8, seed = 1)
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    exact.foreach { case (k, cnt) =>
      val est = cms.estimateCount(k)
      assert(est >= cnt, s"CMS under-counted $k: est=$est < $cnt")
      assert(est <= cnt + math.ceil(0.005 * n).toLong + 1,
        s"CMS over-counted $k beyond eps bound: est=$est, exact=$cnt, n=$n")
    }
  }

  test("java String lookups agree with sketch built from a string column") {
    import spark.implicits._
    val df = Seq.fill(100)("hot").toDF("k")
    val cms = CmsOps.cmsOf(df, col("k"))
    assert(cms.estimateCount("hot") == 100L)
    assert(cms.totalCount() == 100L)
  }

  test("per-group sketches via cmsAgg") {
    import spark.implicits._
    val df = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "z"))
      .toDF("g", "v")
    val rows = df.groupBy("g").agg(CmsOps.cmsAgg(col("v")).as("cms")).collect()
    val byG = rows.map(r => r.getString(0) -> CmsOps.fromBytes(r.getAs[Array[Byte]](1))).toMap
    assert(byG("a").estimateCount("x") == 2L)
    assert(byG("a").estimateCount("y") == 1L)
    assert(byG("b").estimateCount("z") == 1L)
  }

  test("reference-parity implicits getCMS / getCmsForKey") {
    import spark.implicits._
    import CmsOps._
    val ds = Seq("a", "a", "b").toDS()
    assert(ds.getCMS().estimateCount("a") == 2L)
    val pairs = Seq(("k1", 1), ("k1", 2), ("k2", 3)).toDS()
    assert(pairs.getCmsForKey().estimateCount("k1") == 2L)
  }
}
