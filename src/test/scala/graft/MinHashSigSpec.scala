package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MinHashSig

class MinHashSigSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** The HOF formulation MinHashSig replaces — the equivalence oracle. */
  private def hofSig(set: org.apache.spark.sql.Column, numHashes: Int) =
    transform(sequence(lit(0), lit(numHashes - 1)),
      h => array_min(transform(set, s => xxhash64(s, h))))
  // NB: hofSig hashes the STRING per seed; the production pipeline (and
  // MinHashSig) hash the base string once then derive per-seed from the
  // long — so equivalence is against that two-stage form:
  private def twoStageSig(set: org.apache.spark.sql.Column, numHashes: Int) = {
    val h0 = transform(set, s => xxhash64(s))
    transform(sequence(lit(0), lit(numHashes - 1)),
      h => array_min(transform(h0, x => xxhash64(x, h))))
  }

  test("bit-identical to the two-stage HOF formulation on varied inputs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val docs = (1 to 300).map { i =>
      val n = rnd.nextInt(12)
      i.toLong -> Seq.fill(n)(rnd.alphanumeric.take(1 + rnd.nextInt(9)).mkString)
    } :+ (1000L -> Seq.empty[String]) :+
      (1001L -> Seq("unicode ✓ ünïcødé", "", "repeated", "repeated"))
    val df = docs.toDF("id", "sh")
    val got = df.select(col("id"),
      MinHashSig.minHashSig(col("sh"), 16).as("sig")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    val want = df.select(col("id"),
      twoStageSig(col("sh"), 16).as("sig")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (id, sig) =>
      assert(sig == want(id), s"signature diverges for id=$id")
    }
    // empty set → all-NULL minima (array_min([]) = NULL), length preserved
    assert(got(1000L).size == 16 && got(1000L).forall(_ == null))
  }

  test("null elements contribute base hash 42 exactly like xxhash64(NULL)") {
    import spark.implicits._
    val df = Seq((1L, Seq[String]("a", null, "b"))).toDF("id", "sh")
    val got = df.select(MinHashSig.minHashSig(col("sh"), 8).as("sig"))
      .collect().head.getSeq[Any](0)
    val want = df.select(twoStageSig(col("sh"), 8).as("sig"))
      .collect().head.getSeq[Any](0)
    assert(got == want)
  }

  test("interpreted eval equals codegen (wholestage off)") {
    import spark.implicits._
    val df = Seq((1L, Seq("x", "yy", "zzz"))).toDF("id", "sh")
    def run() = df.select(MinHashSig.minHashSig(col("sh"), 16).as("sig"))
      .collect().head.getSeq[Any](0)
    val on = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val off = run()
      assert(on == off)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("the LSH pipeline never inlines MinHashSig into its element_at consumers") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pairs = graft.llm.Dedup.minHashDedupPairs(
      docs, "doc_id", "text", numHashes = 16, bands = 4, threshold = 0.5)
    val p = pairs.queryExecution.optimizedPlan.toString
    // several pipeline legs (banding, the hot-bucket cap count, prefilter)
    // each re-plan the signing subtree — that's consumer count, deduped at
    // execution by exchange reuse. What must NEVER happen is CollapseProject
    // inlining the signature into its 16 element_at consumers (16×
    // re-evaluation per doc): every occurrence must be the materialized
    // `min_hash_sig(...) AS __sig` projection, and element_at must only
    // ever reference the __sig attribute.
    val evals = "min_hash_sig".r.findAllIn(p).size
    val materialized = "min_hash_sig\\([^)]*\\) AS __sig".r.findAllIn(p).size
    assert(evals >= 1, s"MinHashSig missing from plan:\n${p.take(4000)}")
    assert(evals == materialized,
      s"MinHashSig inlined past its __sig alias ($evals evals, $materialized materialized):\n${p.take(4000)}")
    assert(!p.contains("element_at(min_hash_sig"),
      s"element_at re-evaluates the signature:\n${p.take(4000)}")
  }
}
