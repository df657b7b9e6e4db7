package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.skew.SkewAdvisor
import graft.llm.Similarity

/** [[SkewAdvisor.columnSkewProfile]] hand-checked census and
  * [[Similarity.writeIvfIndex]]/`probeIvfIndex` ≡ [[Similarity.ivfTopK]]
  * (index persistence must be transparent to results). */
class SkewColumnProfileSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("columnSkewProfile: exact ndv/top-share/hot-over-avg, NULLs excluded") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("x")), (1L, Some("x")), (1L, Some("y")),
      (2L, Some("x")), (3L, None))
      .toDF("k", "s")
    val got = SkewAdvisor.columnSkewProfile(df, Seq("k", "s"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    // k: 5 nonnull, ndv 3, top=3 ('1') → share 600000; avg=ceil(5/3)=2 → 1
    assert(got("k") == ((5L, 3L, 3L, 600000L, 1L)))
    // s: 4 nonnull (one NULL out), ndv 2, top=3 ('x') → share 750000;
    // avg=ceil(4/2)=2 → hot_over_avg 1
    assert(got("s") == ((4L, 2L, 3L, 750000L, 1L)))
  }

  test("columnSkewProfile: a hot key dominates hot_over_avg") {
    import spark.implicits._
    // 96 rows of one value + 4 distinct others: ndv 5, avg = ceil(100/5)=20,
    // hot_over_avg = 96 div 20 = 4
    val df = (Seq.fill(96)("hot") ++ Seq("a", "b", "c", "d")).toDF("v")
    val r = SkewAdvisor.columnSkewProfile(df, Seq("v")).head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5)) ==
      ((100L, 5L, 96L, 4L)))
  }

  test("probeIvfIndex over a persisted index equals ivfTopK on the same split") {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    val vecs = (0L until 60L).map(i =>
      (i, Seq.fill(8)(rng.nextGaussian().toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    val corpus = df.filter(col("vec_id") % 5 =!= 0)
    val fresh = df.filter(col("vec_id") % 5 === 0)
    val path = java.nio.file.Files.createTempDirectory("graft_ivf_idx")
      .toString + "/idx"
    val cents = Similarity.writeIvfIndex(
      corpus, "vec_id", "embedding", path, nCells = 8)
    val probed = Similarity.probeIvfIndex(
      spark, path, fresh, "vec_id", "embedding", cents, k = 3, nProbe = 3)
      .select("query_id", "neighbor_id", "rank")
    val direct = Similarity.ivfTopK(
      fresh, "vec_id", "embedding", corpus, "vec_id", "embedding",
      k = 3, nCells = 8, nProbe = 3, centroids = Some(cents))
      .select("query_id", "neighbor_id", "rank")
    import graft.testkit.DatasetComparisons._
    probed.ensureDatasetEquals(direct)
    assert(probed.count() > 0)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
  }
}
