package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Vocab

class BpeTrainSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Driver-side reference BPE: greedy left-to-right pair merging over a
    * word histogram, ties to the lexicographically smallest pair. */
  private def refBpe(words: Seq[(String, Long)], merges: Int): Seq[(Long, String, String, Long)] = {
    var vocab = words.map { case (w, n) => (w.map(_.toString).toVector, n) }
    (0 until merges).map { rank =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, n) =>
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + n
        }
      }
      val ((l, r), n) = counts.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.head
      vocab = vocab.map { case (syms, wn) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        syms.foreach { s =>
          if (out.nonEmpty && out.last == l && s == r)
            out(out.size - 1) = l + r
          else out += s
        }
        (out.toVector, wn)
      }
      (rank.toLong, l, r, n)
    }
  }

  test("bpeTrainMerges equals the greedy reference, including re-merge of merged symbols") {
    import spark.implicits._
    // 'aaaa' stresses greedy non-overlap (merges to (aa)(aa), then (aaaa));
    // 'the'/'then' stress merged-symbol re-merge ((th)+(e) -> the)
    val docs = Seq(
      "the theme then the",
      "aaaa aaaa aaaa aaaa aaaa banana",
      "the then banana aaaa"
    ).toDF("text")
    val got = Vocab.bpeTrainMerges(docs, "text", numMerges = 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      .sortBy(_._1)
    val words = docs.as[String].collect().toSeq
      .flatMap(_.split("\\s+")).filter(_.length >= 2)
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }.toSeq
    val expect = refBpe(words, 5)
    assert(got == expect, s"got $got\nexpect $expect")
  }

  test("bpeTrainMerges on the fixture corpus: ranks contiguous, counts non-increasing-ish sane") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = Vocab.bpeTrainMerges(docs, "text", numMerges = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.map(_._1).toSeq == Seq(0L, 1L, 2L))
    assert(got.forall(_._4 > 0))
    // each adopted merge is a distinct pair
    assert(got.map(m => (m._2, m._3)).distinct.length == 3)
  }
}
