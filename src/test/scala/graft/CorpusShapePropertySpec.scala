package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Chunker
import graft.operators.Sessionize

/** Property-based invariants for the corpus-shaping operators:
  *  - chunking is LOSSLESS: dropping each non-first chunk's `overlap`-token
  *    prefix and concatenating reconstructs the normalized token stream;
  *  - sessionization obeys the counting law: sessions per key
  *    = 1 + #(consecutive gaps strictly beyond the threshold).
  */
class CorpusShapePropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val genDocs: Gen[List[(Long, String)]] =
    Gen.listOfN(6, Gen.choose(0, 130)).map(_.zipWithIndex.map {
      case (nTok, id) => id.toLong -> (1 to nTok).map(i => s"t${id}x$i").mkString(" ")
    })

  test("chunking with overlap reconstructs every document exactly") {
    import spark.implicits._
    val prop = Prop.forAll(genDocs,
      Gen.choose(2, 50), Gen.choose(0, 30)) { (docs, chunkTokens, overlapRaw) =>
      val overlap = math.min(overlapRaw, chunkTokens - 1)
      val df = docs.toDF("doc_id", "text")
      val rebuilt = Chunker.chunkDocuments(df, "doc_id", "text", chunkTokens, overlap)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
        .groupBy(_._1)
        .map { case (id, chunks) =>
          val toks = chunks.sortBy(_._2).zipWithIndex.flatMap { case ((_, _, txt), i) =>
            val ts = txt.split(" ").filter(_.nonEmpty)
            if (i == 0) ts else ts.drop(overlap)
          }
          id -> toks.mkString(" ")
        }
      docs.forall { case (id, text) =>
        val want = text.toLowerCase.split("\\s+").filter(_.nonEmpty).mkString(" ")
        rebuilt.getOrElse(id, "") == want
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15).withWorkers(1), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }

  test("session count = 1 + gaps beyond threshold, per key") {
    import spark.implicits._
    val genEvents: Gen[List[(Long, Long, Long)]] = for {
      n <- Gen.choose(1, 60)
      rows <- Gen.listOfN(n, for {
        user <- Gen.choose(1L, 4L)
        ts <- Gen.choose(0L, 500L)
      } yield (user, ts))
    } yield rows.distinct.zipWithIndex.map { case ((u, t), i) => (u, i.toLong, t) }
    val prop = Prop.forAll(genEvents, Gen.choose(0L, 60L)) { (rows, gap) =>
      val df = rows.toDF("user_id", "event_id", "ts_ns")
      val got = Sessionize.sessionStats(df, Seq("user_id"), "ts_ns", "event_id", gap)
        .groupBy("user_id").agg(countDistinct("session_id").as("n_sessions"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = rows.groupBy(_._1).map { case (u, es) =>
        // replicate the operator's order: (ts, tie) ascending
        val ts = es.sortBy(e => (e._3, e._2)).map(_._3)
        u -> (1L + ts.zip(ts.tail).count { case (a, b) => b - a > gap })
      }
      got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15).withWorkers(1), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }
}
