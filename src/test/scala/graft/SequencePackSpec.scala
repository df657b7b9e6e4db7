package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.SequencePack.packSequences

class SequencePackSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Driver-side reference: sort by id, exclusive running sum, floor-div. */
  private def reference(rows: Seq[(Long, Long)], budget: Long): Map[Long, Long] = {
    var acc = 0L
    rows.sortBy(_._1).map { case (id, w) =>
      val chunk = acc / budget
      acc += w
      id -> chunk
    }.toMap
  }

  private def run(rows: Seq[(Long, Long)], budget: Long,
      bucketWidth: Long, parts: Int): Map[Long, Long] = {
    import spark.implicits._
    val df = rows.toDF("id", "w").repartition(parts)
    packSequences(df, "id", "w", budget, Some(bucketWidth))
      .select("id", "chunk_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chunk assignment equals the sequential cumsum reference") {
    val rows = Seq(1L -> 100L, 2L -> 500L, 3L -> 600L, 4L -> 1L,
      5L -> 2048L, 6L -> 10L, 10L -> 0L, 11L -> 4000L, 12L -> 7L)
    assert(run(rows, 1024, bucketWidth = 4, parts = 5) == reference(rows, 1024))
  }

  test("result is independent of input partitioning and bucket width") {
    val rows = (1L to 300L).map(i => i -> (i % 37 + 1))
    val want = reference(rows, 256)
    assert(run(rows, 256, bucketWidth = 16, parts = 1) == want)
    assert(run(rows, 256, bucketWidth = 1024, parts = 13) == want)
    assert(run(rows, 256, bucketWidth = 7, parts = 32) == want)
  }

  test("sparse non-contiguous ids pack by order, not by id value") {
    val rows = Seq(5L -> 10L, 1000L -> 10L, 999999L -> 10L, 7L -> 10L)
    assert(run(rows, 20, bucketWidth = 100, parts = 3) == reference(rows, 20))
  }

  test("oversize documents own their chunks; empty input yields empty output") {
    import spark.implicits._
    val rows = Seq(1L -> 5000L, 2L -> 1L, 3L -> 5000L)
    assert(run(rows, 1024, bucketWidth = 2, parts = 2) == reference(rows, 1024))
    assert(packSequences(Seq.empty[(Long, Long)].toDF("id", "w"), "id", "w", 10).isEmpty)
  }

  test("auto bucketWidth bounds driver rows for any id-space sparsity") {
    import graft.llm.SequencePack.autoBucketWidth
    // a 10^12-wide key space must never produce more than ~2^16 buckets:
    // the old fixed default (1024) would have collected ~10^9 rows here
    def buckets(mn: Long, mx: Long): Long = {
      val w = autoBucketWidth(mn, mx)
      mx / w - mn / w + 1
    }
    assert(buckets(0L, 1000L * 1000 * 1000 * 1000) <= (1L << 16) + 1)
    assert(buckets(Long.MinValue / 4, Long.MaxValue / 4) <= (1L << 16) + 1)
    assert(autoBucketWidth(5L, 5L) == 1L) // degenerate single-id corpus
    // and the auto width changes nothing about the assignment itself
    import spark.implicits._
    val sparse = (1L to 500L).map(i => i * 2000000000L -> (i % 13 + 1))
    val df = sparse.toDF("id", "w").repartition(7)
    val got = packSequences(df, "id", "w", budget = 16)
      .select("id", "chunk_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == reference(sparse, 16))
  }

  test("shardByTokens: shard_id < nShards, contiguous spans, near-equal mass") {
    import spark.implicits._
    import graft.llm.SequencePack.shardByTokens
    val rows = (1L to 200L).map(i => i -> (i % 29 + 1))
    val total = rows.map(_._2).sum
    val n = 8
    val got = shardByTokens(rows.toDF("id", "w").repartition(9), "id", "w", n)
      .select("id", "shard_id", "w")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every row assigned, ids partition into contiguous ranges by shard
    assert(got.length == rows.length)
    assert(got.forall { case (_, s, _) => s >= 0 && s < n })
    val byShard = got.groupBy(_._2).toSeq.sortBy(_._1)
    val ranges = byShard.map { case (s, rs) => (s, rs.map(_._1).min, rs.map(_._1).max) }
    ranges.sliding(2).foreach {
      case Seq((_, _, hi), (_, lo2, _)) => assert(hi < lo2)
      case _ =>
    }
    // balance: each shard's token mass within budget + max single weight
    val budget = (total + n - 1) / n
    byShard.foreach { case (_, rs) =>
      assert(rs.map(_._3).sum <= budget + 29)
    }
    // degenerate: zero total weight → everything in shard 0
    val zeros = Seq(1L -> 0L, 2L -> 0L).toDF("id", "w")
    assert(shardByTokens(zeros, "id", "w", 4)
      .select("shard_id").collect().forall(_.getLong(0) == 0L))
  }

  test("null order keys are dropped; null or negative weights fail loudly") {
    import spark.implicits._
    val withNullId = Seq((Some(1L), Some(10L)), (None, Some(99L)), (Some(2L), Some(10L)))
      .toDF("id", "w")
    val got = packSequences(withNullId, "id", "w", 15)
      .select("id", "chunk_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L))  // null-id row neither packed nor counted

    val withNullW = Seq((Some(1L), Some(10L)), (Some(2L), None)).toDF("id", "w")
    val e1 = intercept[Exception] { packSequences(withNullW, "id", "w", 15).collect() }
    assert(e1.getMessage != null)
    val withNegW = Seq((1L, 10L), (2L, -3L)).toDF("id", "w")
    val e2 = intercept[Exception] { packSequences(withNegW, "id", "w", 15).collect() }
    assert(e2.getMessage != null)
  }
}
