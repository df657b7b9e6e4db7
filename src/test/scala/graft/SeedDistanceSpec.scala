package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SeedDistance.seedDistances

class SeedDistanceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def run(
      edges: Seq[(Long, Long)], seeds: Seq[Long], maxHops: Int,
      ckpt: Option[String] = None): Map[Long, Long] = {
    import spark.implicits._
    seedDistances(edges.toDF("id_a", "id_b"), "id_a", "id_b",
      seeds.toDF("s"), "s", maxHops, ckpt)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("hop distances on a chain + triangle: BFS mins, cap honored, isolated seed kept") {
    // chain 1-2-3-4-5 seeded at 1; triangle 10-11-12 seeded at 10;
    // isolated seed 99; node 20-21 unreachable from any seed
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L))
    val got = run(edges, Seq(1L, 10L, 99L), maxHops = 3)
    assert(got == Map(
      1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, // 5 is 4 hops: beyond the cap
      10L -> 0L, 11L -> 1L, 12L -> 1L, // triangle: both at hop 1, never 2
      99L -> 0L))
  }

  test("multi-seed min: a node reachable from two seeds takes the closer one") {
    // 1-2-3-4 with seeds {1, 4}: node 2 is hop 1 from seed 1 (not 2 from 4)
    val got = run(Seq((1L, 2L), (2L, 3L), (3L, 4L)), Seq(1L, 4L), maxHops = 3)
    assert(got == Map(1L -> 0L, 4L -> 0L, 2L -> 1L, 3L -> 1L))
  }

  test("edges are undirected and self-loops/nulls drop; early drain stops the loop") {
    import spark.implicits._
    // direction reversed relative to the seed; a self-loop; maxHops far
    // beyond the graph's reach must still terminate via the drained check
    val got = run(Seq((2L, 1L), (3L, 3L)), Seq(1L), maxHops = 20)
    assert(got == Map(1L -> 0L, 2L -> 1L))
    val withNull = Seq((Some(1L), None: Option[Long]), (Some(1L), Some(2L)))
      .toDF("id_a", "id_b")
    val g2 = graft.operators.SeedDistance.seedDistances(
      withNull, "id_a", "id_b", Seq(1L).toDF("s"), "s", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g2 == Map(1L -> 0L, 2L -> 1L))
  }

  test("identical distances under reliable checkpointing") {
    val edges = (1L until 20L).map(i => (i, i + 1))
    val local = run(edges, Seq(1L, 15L), maxHops = 4)
    val dir = java.nio.file.Files.createTempDirectory("graft_bfs_ckpt").toFile
    try {
      val reliable = run(edges, Seq(1L, 15L), maxHops = 4,
        ckpt = Some(dir.getAbsolutePath))
      assert(reliable == local)
      def walk(f: java.io.File): Iterator[java.io.File] =
        Iterator(f) ++ Option(f.listFiles()).iterator.flatten.flatMap(walk)
      assert(walk(dir).exists(_.getName.startsWith("rdd-")),
        "reliable mode wrote no checkpoint files")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }
}
