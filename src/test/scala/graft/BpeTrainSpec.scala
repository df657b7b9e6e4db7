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

  /** Reference greedy merge application over one word's symbol sequence. */
  private def refEncode(word: String, merges: Seq[(String, String)]): Int = {
    var syms = word.map(_.toString).toVector
    merges.foreach { case (l, r) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      syms.foreach { s =>
        if (out.nonEmpty && out.last == l && s == r)
          out(out.size - 1) = l + r
        else out += s
      }
      syms = out.toVector
    }
    syms.size
  }

  test("bpeEncode applies trained merges with the trainer's greedy scan (incl. 1-char words)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the theme then the a"),
      (2L, "aaaa aaaa aaaa aaaa aaaa banana"),
      (3L, "the then banana aaaa i i")
    ).toDF("doc_id", "text")
    val merges = Vocab.bpeTrainMerges(docs, "text", numMerges = 4)
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val got = Vocab.bpeEncode(docs, "doc_id", "text", merges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val expect = docs.as[(Long, String)].collect().toSeq.map { case (id, text) =>
      val ws = text.split("\\s+").filter(_.nonEmpty)
      (id, ws.length.toLong, ws.map(w => refEncode(w, merges).toLong).sum)
    }.sortBy(_._1)
    assert(got.toSeq == expect, s"got ${got.toSeq}\nexpect $expect")
    // merges actually compress: fewer symbols than characters
    val chars = docs.as[(Long, String)].collect()
      .map(_._2.count(!_.isWhitespace)).sum
    assert(got.map(_._3).sum < chars)
  }

  test("batched merge adoption ≡ sequential greedy on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    (1 to 4).foreach { trial =>
      // heavy-interaction corpora (tiny alphabet, so top pairs share
      // symbols) mixed with disjoint structure (so batches actually adopt
      // more than one pair) — both regimes must match sequential exactly
      val alphabet = if (trial % 2 == 0) "abcd" else "abcdefgh"
      val words = (0 until 30).map { _ =>
        val len = 2 + rnd.nextInt(5)
        (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      } ++ Seq("xy", "zw", "uv", "st") // disjoint high-count tail
      val rows = words.flatMap(w => Seq.fill(1 + rnd.nextInt(20))(w))
      val df = rows.toDF("text")
      val seq = Vocab.bpeTrainMerges(df, "text", numMerges = 6, batch = 1)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
        .sortBy(_._1).toSeq
      Seq(2, 8).foreach { b =>
        val bat = Vocab.bpeTrainMerges(df, "text", numMerges = 6, batch = b)
          .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
          .sortBy(_._1).toSeq
        assert(bat == seq, s"trial=$trial batch=$b diverged:\nbat $bat\nseq $seq")
      }
    }
  }

  test("batched adoption bounds driver rounds: 16 merges in 2 rounds on disjoint pairs") {
    import spark.implicits._
    // 16 two-char words over 32 distinct symbols: every round's ranked list
    // is fully pairwise-disjoint, so B=8 adopts 8 merges per round
    val words = Seq("ab", "cd", "ef", "gh", "ij", "kl", "mn", "op",
      "qr", "st", "uv", "wx", "yz", "01", "23", "45")
    val rows = words.zipWithIndex.flatMap { case (w, i) => Seq.fill(100 - i)(w) }
    val df = rows.toDF("text")
    val (batched, rounds) = Vocab.bpeTrainMergesWithRounds(df, "text", numMerges = 16, batch = 8)
    assert(rounds == 2, s"expected 2 driver rounds, got $rounds")
    val bat = batched.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).sortBy(_._1).toSeq
    val (seqDf, seqRounds) = Vocab.bpeTrainMergesWithRounds(df, "text", numMerges = 16, batch = 1)
    assert(seqRounds == 16)
    val seq = seqDf.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).sortBy(_._1).toSeq
    assert(bat == seq)
    // and the adopted table is the expected count-ordered disjoint pairs
    assert(bat.map(m => m._2 + m._3) == words)
  }

  /** Train with batch=8 and batch=1, assert identical merge tables (the
    * exactness claim), a sane table, and return (batRounds, n). */
  private def trainBoth(docs: org.apache.spark.sql.DataFrame, n: Int): Int = {
    val (batDf, batRounds) = Vocab.bpeTrainMergesWithRounds(docs, "text", n, batch = 8)
    val bat = batDf.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(bat.length == n)
    val (seqDf, seqRounds) = Vocab.bpeTrainMergesWithRounds(docs, "text", n, batch = 1)
    assert(seqRounds == n)
    val seq = seqDf.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(bat == seq, s"batched adoption diverged from sequential greedy at $n merges")
    assert(bat.map(_._1) == (0L until n.toLong))
    assert(bat.map(m => (m._2, m._3)).distinct.length == n)
    assert(bat.forall(_._4 > 0))
    batRounds
  }

  test("80 merges on the real fixture corpus: batched ≡ sequential") {
    // the fixture vocabulary is 31 distinct words — BPE exhausts all
    // adjacent pairs at 89 merges, so 80 is the realistic fixture-scale run
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val rounds = trainBoth(docs, 80)
    assert(rounds <= 80, s"rounds can never exceed merges: $rounds")
  }

  test("200 merges at vocabulary scale: batched ≡ sequential, rounds strictly reduced") {
    // the executable form of the batched-adoption claim (r11 VERDICT task
    // 6) needs a corpus whose pair structure survives 200 merges — a
    // seeded 400-word zipf-ish corpus (the fixture's 31-word vocabulary
    // cannot). Natural-text interaction means no disjoint-corpus
    // rounds≈N/B bound applies; the provable properties are (a) EXACTNESS:
    // the 200-merge table is identical to one-at-a-time greedy, and (b)
    // PROGRESS: batching adopts >1 pair in at least some rounds, so driver
    // rounds come in strictly under one-per-merge
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val letters = "abcdefghijklmnopqrstuvwxyz"
    val vocab = (0 until 400).map { _ =>
      val len = 3 + rnd.nextInt(8)
      (0 until len).map(_ => letters(rnd.nextInt(26))).mkString
    }.distinct
    // zipf-ish natural tail (top pair count ≈ 2000, heavily interacting —
    // those rounds adopt 1, exactly like real text) + 16 planted two-char
    // words over 32 DISTINCT characters whose counts clear the 4× blocked
    // bound: the first two batch=8 rounds must adopt all 16
    val planted = Seq("ab", "cd", "ef", "gh", "ij", "kl", "mn", "op",
      "qr", "st", "uv", "wx", "yz", "01", "23", "45")
    val rows = vocab.zipWithIndex.flatMap { case (w, i) =>
      Seq.fill(1 + 2000 / (i + 1))(w) } ++
      planted.zipWithIndex.flatMap { case (w, i) => Seq.fill(100000 - i)(w) }
    val docs = rnd.shuffle(rows).grouped(50).map(_.mkString(" ")).toSeq.toDF("text")
    val n = 200
    val rounds = trainBoth(docs, n)
    assert(rounds <= n - 14,
      s"batch=8 should adopt the 16 planted disjoint pairs in 2 rounds, got $rounds")
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
