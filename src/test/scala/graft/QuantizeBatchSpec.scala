package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Batching, Quantize, Similarity}
import graft.testkit.DatasetComparisons._

class QuantizeBatchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")
  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  test("int8 quantization bounds codes, scales, and reconstruction error") {
    val q = Quantize.quantizeInt8(emb, "vec_id", "embedding").cache()
    val bad = q.filter(exists(col("codes"), c => c < -127 || c > 127)).count()
    assert(bad == 0, "codes must lie in [-127, 127]")
    // reconstruction error per component <= scale/127 + floor truncation (one step)
    val joined = Quantize.dequantizeInt8(q, "codes", "scale")
      .join(emb.select(col("vec_id"), col("embedding")), "vec_id")
      .withColumn("err", array_max(zip_with(
        col("vec_approx"), col("embedding"),
        (a, x) => abs(a - x.cast("double")))))
      .filter(col("err") > col("scale") / 127.0 * 1.000001)
    assert(joined.count() == 0, "per-component error must be <= scale/127")
    q.unpersist()
  }

  test("int8 quantization handles the zero vector and is deterministic") {
    import spark.implicits._
    val df = Seq((1L, Seq(0.0f, 0.0f)), (2L, Seq(1.0f, -0.5f))).toDF("vec_id", "embedding")
    val got = Quantize.quantizeInt8(df, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> ((r.getSeq[Long](1), r.getDouble(2)))).toMap
    assert(got(1L) == ((Seq(0L, 0L), 0.0)))
    assert(got(2L)._1 == Seq(127L, -64L)) // floor(-0.5/1*127) = floor(-63.5) = -64
    assert(got(2L)._2 == 1.0)
  }

  test("hard negatives exclude same-label neighbors entirely") {
    import spark.implicits._
    val vs = Seq(
      (0L, Seq(1.0f, 0.0f), "a"),
      (1L, Seq(0.99f, 0.1f), "a"),   // nearest overall but SAME label
      (2L, Seq(0.9f, 0.3f), "b"),    // nearest different-label
      (3L, Seq(-1.0f, 0.0f), "b")
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegativeTopK(
      vs.filter(col("vec_id") === 0), "vec_id", "embedding", "label",
      vs, "vec_id", "embedding", "label", k = 2)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(got == Seq(2L, 3L), s"got $got") // id 1 (same label) never appears
  }

  test("length batching fills batches within buckets, partitioning-independent") {
    val withLen = docs.withColumn("n_tokens",
      size(graft.llm.TextStats.tokens(
        graft.llm.TextStats.normalizeText(col("text")))).cast("long"))
    val a = Batching.batchByLength(withLen, "doc_id", "n_tokens", batchSize = 8)
      .select("doc_id", "len_bucket", "batch_idx")
    val b = Batching.batchByLength(withLen.repartition(13), "doc_id", "n_tokens",
      batchSize = 8).select("doc_id", "len_bucket", "batch_idx")
    a.ensureDatasetEquals(b)
    // no batch exceeds batchSize, and within a bucket only the LAST batch
    // may be smaller
    val sizes = a.groupBy("len_bucket", "batch_idx").count().cache()
    assert(sizes.filter(col("count") > 8).count() == 0)
    val partial = sizes.filter(col("count") < 8)
      .join(sizes.groupBy("len_bucket").agg(max("batch_idx").as("last")),
        "len_bucket")
      .filter(col("batch_idx") =!= col("last"))
    assert(partial.count() == 0, "only the final batch of a bucket may be partial")
    sizes.unpersist()
  }

  test("embeddingDrift: identical snapshots drift zero; a shifted group drifts as computed") {
    import spark.implicits._
    val a = Seq(
      (1L, "x", Seq(1.0f, 0.0f)), (2L, "x", Seq(1.0f, 0.0f)),
      (3L, "y", Seq(0.0f, 1.0f)))
      .toDF("vec_id", "label", "embedding")
    val zero = graft.llm.Quantize.embeddingDrift(a, a, "label", "embedding")
      .collect().map(r => r.getString(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(zero == Map("x" -> ((0L, 0L)), "y" -> ((0L, 0L))))
    // b: group x flips to (0,1) — codes move from (127,0) to (0,127) per
    // dim: fixed-point means differ by 127e6 in both dims → l1 = 254e6
    val b = Seq(
      (4L, "x", Seq(0.0f, 1.0f)), (5L, "x", Seq(0.0f, 1.0f)),
      (6L, "y", Seq(0.0f, 1.0f)))
      .toDF("vec_id", "label", "embedding")
    val got = graft.llm.Quantize.embeddingDrift(a, b, "label", "embedding")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("x") == ((2L, 2L, 254000000L, 127000000L)))
    assert(got("y") == ((1L, 1L, 0L, 0L)))
  }
}
