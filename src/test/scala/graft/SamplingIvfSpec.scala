package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Sampling, Similarity}
import graft.testkit.DatasetComparisons._

class SamplingIvfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sf/documents.parquet")
  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("hash sample is deterministic and partitioning-independent") {
    val a = Sampling.sampleByHash(docs, "doc_id", 0.3)
      .select("doc_id")
    val b = Sampling.sampleByHash(docs.repartition(17), "doc_id", 0.3)
      .select("doc_id")
    a.ensureDatasetEquals(b)
    assert(a.count() > 0 && a.count() < docs.count())
  }

  test("hash sample respects fraction bounds 0 and 1") {
    assert(Sampling.sampleByHash(docs, "doc_id", 0.0).count() == 0)
    assert(Sampling.sampleByHash(docs, "doc_id", 1.0).count() == docs.count())
  }

  test("different salts draw different (but individually stable) samples") {
    val a = Sampling.sampleByHash(docs, "doc_id", 0.5, salt = "s1")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.sampleByHash(docs, "doc_id", 0.5, salt = "s2")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a != b)
  }

  test("corpus mixture = per-corpus hash samples with provenance tags") {
    val headSrcs = (0 to 9).map("src" + _)
    val head = docs.filter(col("source").isin(headSrcs: _*))
    val tail = docs.filter(!col("source").isin(headSrcs: _*))
    val mix = Sampling.mixCorpora(
      Seq(("head", head, 0.25), ("tail", tail, 0.75)), "doc_id")
    val want = Sampling.sampleByHash(head, "doc_id", 0.25, salt = "head")
      .withColumn("corpus", lit("head"))
      .unionByName(Sampling.sampleByHash(tail, "doc_id", 0.75, salt = "tail")
        .withColumn("corpus", lit("tail")))
    mix.ensureDatasetEquals(want)
    // each corpus actually thinned at its own rate, and tags partition rows
    val byCorpus = mix.groupBy("corpus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byCorpus("head") < head.count() && byCorpus("tail") < tail.count())
    assert(byCorpus("head") + byCorpus("tail") == mix.count())
    intercept[IllegalArgumentException] {
      Sampling.mixCorpora(Seq(("a", head, 0.5), ("a", tail, 0.5)), "doc_id")
    }
  }

  test("vocab top-k counts tokens and docs with a deterministic tie order") {
    import spark.implicits._
    val df = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "Apple!  date")  // normalization folds case and punctuation
    ).toDF("id", "txt")
    val got = graft.llm.Vocab.topTokens(df, "id", "txt", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // apple: 3 occ / 2 docs; banana: 2 occ / 2 docs; cherry & date tie at
    // 1 occ — cherry wins the tie alphabetically
    assert(got == Seq(("apple", 2L, 3L), ("banana", 2L, 2L), ("cherry", 1L, 1L)))
  }

  test("stratified sample applies per-stratum fractions and the default") {
    val out = Sampling.stratifiedSampleByHash(
      docs, "doc_id", "lang", Map("en" -> 1.0, "fr" -> 0.0), defaultFraction = 0.5)
    val counts = out.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("en") == full("en"))
    assert(!counts.contains("fr"))
    val others = full.keySet -- Set("en", "fr")
    val kept = others.toSeq.map(l => counts.getOrElse(l, 0L)).sum.toDouble
    val total = others.toSeq.map(full).sum.toDouble
    assert(kept / total > 0.3 && kept / total < 0.7,
      s"default-fraction strata kept ${kept / total} of rows, expected ~0.5")
  }

  test("stratum membership of a row is stable regardless of other strata") {
    // sampling hash ignores the stratum — only the cutoff differs — so a
    // row's membership at fraction f is monotone in f
    val small = Sampling.stratifiedSampleByHash(
      docs, "doc_id", "lang", Map("en" -> 0.2), defaultFraction = 0.2)
      .select("doc_id")
    val big = Sampling.stratifiedSampleByHash(
      docs, "doc_id", "lang", Map("en" -> 0.8), defaultFraction = 0.8)
      .select("doc_id")
    assert(small.exceptAll(big).count() == 0, "f=0.2 sample must nest inside f=0.8")
  }

  test("ivfTopK probing all cells equals brute force exactly") {
    val q = emb.filter(col("vec_id") < 5)
    val ivf = Similarity.ivfTopK(q, "vec_id", "embedding",
        emb, "vec_id", "embedding", k = 3, nCells = 4, nProbe = 4)
      .select("query_id", "neighbor_id", "rank")
    val bf = Similarity.bruteForceTopK(q, "vec_id", "embedding",
        emb, "vec_id", "embedding", k = 3)
      .select("query_id", "neighbor_id", "rank")
    ivf.ensureDatasetEquals(bf)
  }

  test("meanReciprocalRank: hand-built geometry, ranks agree with bruteForceTopK") {
    import spark.implicits._
    // axis-aligned unit-ish vectors: for q=(1,0), candidates sorted by
    // cosine are 10 (same dir), 11 (30°), 12 (60°), 13 (90°). Labels put
    // the first relevant at rank 1 for q1 (10 shares label 7) and at
    // rank 3 for q2 (only 12 shares label 8).
    val data = Seq(
      (1L, Array(1.0f, 0.0f), 7), (2L, Array(0.0f, 1.0f), 8),
      (10L, Array(0.9f, 0.0f), 7), (11L, Array(0.866f, 0.5f), 9),
      (12L, Array(0.5f, 0.866f), 8), (13L, Array(0.0f, 0.7f), 9)
    ).toDF("vec_id", "embedding", "label")
    val q = data.filter(col("vec_id") < 10)
    val got = Similarity.meanReciprocalRank(
      q, "vec_id", "embedding", "label",
      data, "vec_id", "embedding", "label")
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    // q1=(1,0): first same-label (7) neighbor is 10 at rank 1 → rr 1e6
    assert(got(1L) == ((1L, 1000000L)))
    // q2=(0,1): ordering is 13 (cos 1), 12, 2?  — q2 excluded as self;
    // candidates by cosine to (0,1): 13 (1.0), 12 (.866), 11 (.5), 1/10 (0)
    // first label-8 is 12 at rank 2 → rr 500_000
    assert(got(2L) == ((2L, 500000L)))
    // cross-check first_rank against the full bruteForceTopK ranking
    val bf = Similarity.bruteForceTopK(q, "vec_id", "embedding",
        data, "vec_id", "embedding", k = 10)
      .join(data.select(col("vec_id").as("neighbor_id"), col("label").as("nl")),
        Seq("neighbor_id"))
      .join(q.select(col("vec_id").as("query_id"), col("label").as("ql")),
        Seq("query_id"))
      .filter(col("nl") === col("ql"))
      .groupBy("query_id").agg(min("rank").as("first_rank"))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(got.view.mapValues(_._1).toMap == bf)
  }

  test("meanReciprocalRank: string id columns, exact-cosine tie breaks to smaller id") {
    import spark.implicits._
    // corpus docs "b" and "a" are the SAME vector (cosine tie at 1.0 with
    // the query) and share the query's label: the ascending-id tie-break
    // must pick "a" as the argmax and rank "b" behind it (first_rank 1,
    // not 2). String ids pin the no-arithmetic-negation tie-break path.
    val data = Seq(
      ("q1", Array(1.0f, 0.0f), 7),
      ("b", Array(1.0f, 0.0f), 7), ("a", Array(1.0f, 0.0f), 7),
      ("c", Array(0.0f, 1.0f), 7)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.meanReciprocalRank(
      data.filter(col("vec_id") === "q1"), "vec_id", "embedding", "label",
      data, "vec_id", "embedding", "label")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got == Map("q1" -> 1000000L))
  }

  test("ivfTopK with fewer probes returns at most k ranked rows per query") {
    val q = emb.filter(col("vec_id") < 5)
    val out = Similarity.ivfTopK(q, "vec_id", "embedding",
      emb, "vec_id", "embedding", k = 3, nCells = 8, nProbe = 2)
    val perQuery = out.groupBy("query_id").count()
      .collect().map(_.getLong(1))
    assert(perQuery.forall(_ <= 3))
    val ranks = out.filter(col("query_id") === 0).orderBy("rank")
      .select("rank").collect().map(_.getInt(0)).toSeq
    assert(ranks == (1 to ranks.length))
  }

  test("ivfPqTopK candidates come only from probed cells; codes agree with pqTopK") {
    val q = emb.filter(col("vec_id") < 5)
    // all cells probed -> candidate set equals pqTopK's full scan, and the
    // ADC ranking is the same arithmetic, so results must agree exactly
    val full = Similarity.ivfPqTopK(q, "vec_id", "embedding",
        emb, "vec_id", "embedding", k = 3, nCells = 4, nProbe = 4)
      .select("query_id", "neighbor_id", "rank")
    val pq = Similarity.pqTopK(q, "vec_id", "embedding",
        emb, "vec_id", "embedding", k = 3)
      .select("query_id", "neighbor_id", "rank")
    full.ensureDatasetEquals(pq)
    // pruned probing: bounded output, contiguous ranks
    val pruned = Similarity.ivfPqTopK(q, "vec_id", "embedding",
      emb, "vec_id", "embedding", k = 3, nCells = 8, nProbe = 2)
    assert(pruned.groupBy("query_id").count()
      .collect().map(_.getLong(1)).forall(_ <= 3))
    val ranks = pruned.filter(col("query_id") === 0).orderBy("rank")
      .select("rank").collect().map(_.getInt(0)).toSeq
    assert(ranks == (1 to ranks.length))
  }

  test("ivfTopK accepts explicit centroids (model-parameter path)") {
    val cents = Seq(0L -> Seq.fill(64)(1.0), 1L -> Seq.fill(64)(-1.0))
    val out = Similarity.ivfTopK(
      emb.filter(col("vec_id") < 3), "vec_id", "embedding",
      emb, "vec_id", "embedding", k = 2, nCells = 2, nProbe = 1,
      centroids = Some(cents))
    assert(out.count() > 0)
  }

  test("pqTopK ranks an exact duplicate of the query first") {
    import spark.implicits._
    val corpus = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),   // codebook vector 0
      (1L, Seq(0.0f, 1.0f, 2.0f, 0.0f)),   // codebook vector 1
      (2L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),   // duplicate of vector 0
      (3L, Seq(5.0f, 5.0f, 5.0f, 5.0f))
    ).toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") === 0)
    val out = Similarity.pqTopK(queries, "vec_id", "embedding",
      corpus, "vec_id", "embedding", k = 3,
      numSubspaces = 2, codebookSize = 2, dim = 4)
      .orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    // the duplicate (id 2) shares every code with the query → minimal ADC
    // distance → rank 1; the query itself (id 0) is excluded
    assert(out.head == ((2L, 1)), s"got ${out.toSeq}")
    assert(!out.map(_._1).contains(0L))
  }

  test("pqTopK returns k ranked rows per query on real embeddings") {
    val out = Similarity.pqTopK(
      emb.filter(col("vec_id") < 5), "vec_id", "embedding",
      emb, "vec_id", "embedding", k = 3).cache()
    val perQuery = out.groupBy("query_id").count().collect()
    assert(perQuery.length == 5 && perQuery.forall(_.getLong(1) == 3L))
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("Broadcast"), s"query LUTs not broadcast:\n$p")
    out.unpersist()
  }

  test("interleaveSources: residue classes per source, dense total order on equal sizes") {
    import spark.implicits._
    val df = (1L to 40L).map(i => (i, s"s${i % 4}")).toDF("id", "src")
    val out = graft.llm.Sampling.interleaveSources(
      df, "id", "src", Seq("s0", "s1", "s2", "s3"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // equal-sized sources → positions are exactly 0..39, no gaps
    assert(out.map(_._3).sorted.toSeq == (0L until 40L))
    // every source's positions sit in its residue class mod 4
    val idxOf = Map("s0" -> 0L, "s1" -> 1L, "s2" -> 2L, "s3" -> 3L)
    assert(out.forall { case (_, src, pos) => pos % 4 == idxOf(src) })
    // out-of-list sources are dropped
    val withExtra = df.unionAll(Seq((99L, "s9")).toDF("id", "src"))
    val out2 = graft.llm.Sampling.interleaveSources(
      withExtra, "id", "src", Seq("s0", "s1", "s2", "s3"))
    assert(out2.filter(col("src") === "s9").count() == 0)
    // deterministic under repartitioning
    val a = graft.llm.Sampling.interleaveSources(
      df.repartition(7), "id", "src", Seq("s0", "s1", "s2", "s3"))
    a.ensureDatasetEquals(graft.llm.Sampling.interleaveSources(
      df, "id", "src", Seq("s0", "s1", "s2", "s3")))
  }
}
