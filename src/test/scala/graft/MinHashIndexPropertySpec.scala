package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Dedup

/** Bipartite recall property for the persisted MinHash index
  * ([[Dedup.writeMinHashIndex]] / [[Dedup.probeMinHashIndex]]):
  *
  *   probe(fresh, index(hist))  ⊇  minHashDedupPairs(fresh ∪ hist)
  *                                   restricted to fresh × hist pairs
  *
  * for random corpora, parameters, bucket caps, and splits. This pins the
  * structural argument that build-time bucket drops can never cost recall
  * relative to the full within-corpus pipeline: an index bucket is dropped
  * only when ONE side alone exceeds the cap, which implies the union-corpus
  * bucket exceeds it too (so the full pipeline dropped it as well), and the
  * full pipeline's minAgree prefilter only ever removes its OWN candidates.
  * The probe may legitimately find MORE (a bucket can exceed the cap only
  * as a union), which is why the containment is one-sided.
  */
class MinHashIndexPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // base docs plus mutated copies, so thresholds from 0.3 to 0.7 all see
  // genuine near-dup pairs; vocabulary is small enough for incidental
  // shingle overlap between unrelated docs too
  private val genCorpus: Gen[List[(Long, String)]] = for {
    nBase <- Gen.choose(4, 8)
    base <- Gen.listOfN(nBase, for {
      len <- Gen.choose(6, 16)
      toks <- Gen.listOfN(len, Gen.choose(1, 40).map(i => s"tok$i"))
    } yield toks.mkString(" "))
    nDup <- Gen.choose(2, 6)
    dups <- Gen.listOfN(nDup, for {
      src <- Gen.choose(0, nBase - 1)
      tail <- Gen.choose(0, 60)
    } yield s"${base(src)} extra$tail")
  } yield (base ++ dups).zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private val genParams: Gen[(Int, Int, Int, Double, Int)] = for {
    bands <- Gen.oneOf(2, 4, 8)
    rowsPerBand <- Gen.oneOf(1, 2, 4)
    shingleSize <- Gen.oneOf(2, 3, 5)
    threshold <- Gen.oneOf(0.3, 0.5, 0.7)
    // tiny caps exercise the build-time bucket-drop path hard
    maxBucketSize <- Gen.oneOf(2, 4, 256)
  } yield (bands * rowsPerBand, bands, shingleSize, threshold, maxBucketSize)

  test("probe candidates contain every full-pipeline pair across the split") {
    import spark.implicits._
    val prop = Prop.forAll(genCorpus, genParams, Gen.oneOf(2L, 3L)) {
      case (docs, (numHashes, bands, shingleSize, threshold, cap), modulus) =>
        val df = docs.toDF("doc_id", "text")
        val fresh = df.filter(col("doc_id") % modulus === 0)
        val hist = df.filter(col("doc_id") % modulus =!= 0)
        val freshIds = docs.map(_._1).filter(_ % modulus == 0).toSet
        val dir = java.nio.file.Files.createTempDirectory("graft_mhprop_").toString
        try {
          Dedup.writeMinHashIndex(hist, "doc_id", "text", dir,
            numHashes, bands, shingleSize, cap)
          val probed = Dedup.probeMinHashIndex(fresh, "doc_id", "text", dir,
              numHashes, bands, shingleSize, threshold, cap)
            .select("fresh_id", "hist_id")
            .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
          // rescue = false: the index drops over-cap bucket rows at BUILD
          // time, so the probe's contract is the drop-policy pipeline —
          // the r14 over-cap rescue finds extra pairs a build-time-dropped
          // index cannot reproduce by construction (documented at
          // minHashDedupPairs/probeMinHashIndex)
          val full = Dedup.minHashDedupPairs(df, "doc_id", "text",
              numHashes, bands, shingleSize, threshold, cap, rescue = false)
            .select("id_a", "id_b")
            .collect().map(r => (r.getLong(0), r.getLong(1)))
          val fullBipartite = full.flatMap { case (a, b) =>
            if (freshIds(a) && !freshIds(b)) Some((a, b))
            else if (freshIds(b) && !freshIds(a)) Some((b, a))
            else None
          }.toSet
          val missing = fullBipartite -- probed
          Prop(missing.isEmpty) :| (
            s"probe missed $missing (numHashes=$numHashes bands=$bands " +
            s"shingle=$shingleSize thr=$threshold cap=$cap mod=$modulus)")
        } finally {
          org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
        }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12).withWorkers(1), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }
}
