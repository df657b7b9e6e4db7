package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Dedup

/** r14 over-cap connectivity rescue: buckets above `maxBucketSize` must
  * contribute LINEAR star+chain candidates (not O(m²), not nothing), and
  * buckets above `rescueLimit` must still be dropped outright. The 100×
  * probe measured full-clique recall at 46% under the old drop-everything
  * behavior; these pins make the rescue contract explicit. */
class BucketRescueSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def bucketed(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("id", "bucket")
  }

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("over-cap bucket yields star + chain, not m² and not nothing") {
    val in = bucketed((10L to 60L by 10).map(i => i -> "b"): _*)
    val got = pairs(Dedup.candidatePairs(in, Seq("bucket"), maxBucketSize = 3))
    val star = (20L to 60L by 10).map(i => (10L, i)).toSet
    val chain = (10L to 50L by 10).map(i => (i, i + 10)).toSet
    assert(got == star ++ chain) // 9 pairs: linear, connected, not C(6,2)=15
  }

  test("beyond rescueLimit the bucket is dropped outright") {
    val in = bucketed((10L to 60L by 10).map(i => i -> "b"): _*)
    val got = Dedup.candidatePairs(in, Seq("bucket"),
      maxBucketSize = 3, rescueLimit = 5)
    assert(got.isEmpty)
  }

  test("under-cap buckets still pair fully; mixed buckets don't cross") {
    val in = bucketed(
      1L -> "small", 2L -> "small", 3L -> "small",
      101L -> "big", 102L -> "big", 103L -> "big", 104L -> "big", 105L -> "big")
    val got = pairs(Dedup.candidatePairs(in, Seq("bucket"), maxBucketSize = 4))
    val full = Set((1L, 2L), (1L, 3L), (2L, 3L))
    val rescue = Set((101L, 102L), (101L, 103L), (101L, 104L), (101L, 105L),
      (102L, 103L), (103L, 104L), (104L, 105L))
    assert(got == full ++ rescue)
    assert(got.forall { case (a, b) => (a < 100) == (b < 100) })
  }

  test("end-to-end: a clique trapped in over-cap buckets stays one verified component") {
    import spark.implicits._
    // 8 copies of the same text (distinct trailing token): every band
    // bucket holds all 8 docs, far over a cap of 2 — pre-r14 this found
    // ZERO pairs; the rescue must keep the family one connected component
    val docs = (0L until 8L)
      .map(i => (i, s"the quick brown fox jumps over the lazy dog again and again t$i"))
      .toDF("doc_id", "text")
    val found = Dedup.minHashDedupPairs(docs, "doc_id", "text",
      numHashes = 32, bands = 16, threshold = 0.5, maxBucketSize = 2)
    assert(found.count() >= 7) // at least a spanning structure survived
    val comps = graft.operators.ConnectedComponents
      .connectedComponents(found.select("id_a", "id_b"))
      .select("component").distinct().collect()
    assert(comps.length == 1 && comps.head.getLong(0) == 0L)
  }
}
