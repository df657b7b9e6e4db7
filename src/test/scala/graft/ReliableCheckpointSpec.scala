package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ConnectedComponents.{connectedComponents, incrementalComponents}
import graft.operators.PageRank.pageRankInt
import graft.llm.KMeans

/** VERDICT r13 task 4: the iterative operators' `checkpointDir` knob —
  * reliable (cluster-store) checkpointing must change ONLY the persistence
  * contract, never a value. Each test runs the same input through the
  * default localCheckpoint path and the reliable path and asserts identical
  * results, plus that the reliable path actually wrote checkpoint files
  * (proof it didn't silently fall back). */
class ReliableCheckpointSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def withCkptDir[A](body: String => A): A = {
    val dir = Files.createTempDirectory("graft_reliable_ckpt").toFile
    try body(dir.getAbsolutePath)
    finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  /** Reliable checkpoints land as part-files under <dir>/<uuid>/rdd-N. */
  private def wroteCheckpoint(dir: String): Boolean = {
    def walk(f: java.io.File): Iterator[java.io.File] =
      Iterator(f) ++ Option(f.listFiles()).iterator.flatten.flatMap(walk)
    walk(new java.io.File(dir)).exists(_.getName.startsWith("rdd-"))
  }

  private def asMap(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("connectedComponents: identical assignment under reliable checkpointing") {
    import spark.implicits._
    val pairs = ((for { a <- 100L to 104L; b <- (a + 1) to 104L } yield (a, b)) ++
      (1L until 30L).map(i => (i, i + 1))).toDF("id_a", "id_b")
    val local = asMap(connectedComponents(pairs))
    withCkptDir { dir =>
      val reliable = asMap(connectedComponents(pairs, checkpointDir = Some(dir)))
      assert(reliable == local)
      assert(wroteCheckpoint(dir), "reliable mode wrote no checkpoint files")
    }
  }

  test("incrementalComponents: identical fold under reliable checkpointing") {
    import spark.implicits._
    val assign = connectedComponents(
      Seq((1L, 2L), (5L, 6L), (8L, 9L)).toDF("id_a", "id_b"))
      .withColumnRenamed("node", "node").select(col("node"), col("component"))
    val newPairs = Seq((2L, 5L), (20L, 21L)).toDF("id_a", "id_b")
    val local = asMap(incrementalComponents(assign, newPairs))
    withCkptDir { dir =>
      val reliable = asMap(
        incrementalComponents(assign, newPairs, checkpointDir = Some(dir)))
      assert(reliable == local)
      assert(wroteCheckpoint(dir), "reliable mode wrote no checkpoint files")
    }
  }

  test("pageRankInt: bit-identical integer ranks under reliable checkpointing") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L), (1L, 3L))
      .toDF("src", "dst")
    val local = asMap(pageRankInt(edges, "src", "dst", iters = 3))
    withCkptDir { dir =>
      val reliable = asMap(
        pageRankInt(edges, "src", "dst", iters = 3, checkpointDir = Some(dir)))
      assert(reliable == local)
      assert(wroteCheckpoint(dir), "reliable mode wrote no checkpoint files")
    }
  }

  test("KMeans.fit: identical centroids under reliable corpus checkpointing") {
    import spark.implicits._
    val vecs = (0L until 40L).map { i =>
      (i, Array(((i * 37 + 11) % 101).toFloat / 101f,
        ((i * 53 + 29) % 97).toFloat / 97f))
    }.toDF("vec_id", "embedding")
    val local = KMeans.fit(vecs, "vec_id", "embedding",
      nCells = 4, iters = 3, dim = 2)
    withCkptDir { dir =>
      val reliable = KMeans.fit(vecs, "vec_id", "embedding",
        nCells = 4, iters = 3, dim = 2, checkpointDir = Some(dir))
      assert(reliable == local)
      assert(wroteCheckpoint(dir), "reliable mode wrote no checkpoint files")
    }
  }
}
