package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Dedup

/** Property pin for the ExactSubstr census/apply pair: on random corpora
  * (small vocabulary so windows collide often, mixed doc lengths straddling
  * the window size), the distributed census must equal a brute-force
  * driver-side reference, and the apply must strip exactly the census's
  * covered positions. Seeded for determinism. */
class SubstringDedupPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Brute-force reference: per doc, positions covered by any window that a
    * smaller-id doc also contains, as a (nTokens, covered) pair. */
  private def reference(
      docs: Seq[(Long, Seq[String])], w: Int): Map[Long, (Long, Long)] = {
    val grams = docs.flatMap { case (id, toks) =>
      (0 to toks.length - w).map(p => (toks.slice(p, p + w).mkString(" "), id, p))
    }
    val owner = grams.groupBy(_._1).map { case (g, occ) => g -> occ.map(_._2).min }
    docs.map { case (id, toks) =>
      val covered = scala.collection.mutable.Set.empty[Int]
      (0 to toks.length - w).foreach { p =>
        val g = toks.slice(p, p + w).mkString(" ")
        if (owner(g) < id) (p until p + w).foreach(covered += _)
      }
      id -> ((toks.length.toLong, covered.size.toLong))
    }.toMap
  }

  private val genCorpus: Gen[(Seq[(Long, String)], Int)] = for {
    w <- Gen.oneOf(2, 3, 4)
    vocab <- Gen.oneOf(3, 6) // tiny vocab → heavy window collisions
    nDocs <- Gen.choose(3, 12)
    docs <- Gen.sequence[Seq[(Long, String)], (Long, String)](
      (0 until nDocs).map { i =>
        for {
          len <- Gen.choose(0, 12) // includes docs shorter than the window
          toks <- Gen.listOfN(len, Gen.choose(0, vocab - 1).map(v => s"w$v"))
        } yield (i.toLong, toks.mkString(" "))
      })
  } yield (docs, w)

  test("census ≡ brute-force reference and apply strips exactly the census (property)") {
    import spark.implicits._
    val prop = Prop.forAll(genCorpus) { case (docs, w) =>
      val df = docs.toDF("doc_id", "text")
      val toksById = docs.map { case (id, text) =>
        id -> text.split("\\s+").filter(_.nonEmpty).toSeq
      }
      val want = reference(toksById, w)
      val got = Dedup.exactSubstringDupStats(df, "doc_id", "text", w)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got == want, s"census diverged (w=$w):\ngot  $got\nwant $want")
      val stripped = Dedup.stripDuplicatedSpans(df, "doc_id", "text", w)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
      want.foreach { case (id, (n, dup)) =>
        val (kept, txt) = stripped(id)
        assert(kept == n - dup, s"doc $id: kept $kept != ${n - dup}")
        val nTxtToks = txt.split("\\s+").count(_.nonEmpty)
        assert(nTxtToks.toLong == kept, s"doc $id: rebuilt text has $nTxtToks tokens")
      }
      true
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15)
        .withInitialSeed(Seed(20260814L)), prop)
    assert(res.passed, res.status.toString)
  }
}
