package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus vocabulary statistics: the top-k tokens by total occurrence count,
  * with document frequencies — the first step of vocabulary construction /
  * BPE training and a standard corpus-health diagnostic (a vocabulary
  * dominated by boilerplate tokens flags template spam before training).
  *
  * '''Plan shape (the 100-TB design).''' explode → per-(token, doc) count
  * (map-side combined; also yields document frequency without a second scan)
  * → per-token sum/count → global top-k. The top-k is `ORDER BY … LIMIT k`,
  * which Spark executes as `TakeOrderedAndProject`: each partition keeps its
  * own k-row heap and the driver merges partition winners — no global sort,
  * no single-reducer funnel, O(k) driver memory. Ties rank deterministically
  * by token text. Same normalized tokenizer as the dedup/TF-IDF paths.
  */
object Vocab {

  def topTokens(df: DataFrame, idCol: String, textCol: String, k: Int = 100): DataFrame = {
    require(k > 0, "k must be positive")
    val toks = df.select(col(idCol).as("__graft_doc"),
      explode(TextStats.tokens(TextStats.normalizeText(col(textCol)))).as("token"))
    toks
      .groupBy("token", "__graft_doc")
      .agg(count(lit(1)).as("__graft_c"))
      .groupBy("token")
      .agg(count(lit(1)).as("n_docs"), sum("__graft_c").as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("token"))
      .limit(k)
  }

  /** Vocabulary COVERAGE CURVE: for each candidate vocabulary size k, what
    * fraction of all token occurrences the k most frequent tokens cover —
    * the tokenizer-sizing question (how big must the vocab be before the
    * OOV/byte-fallback rate is acceptable) answered in one pass over the
    * token histogram. Integer-exact: counts, covered sums, and
    * `coverage_ppm = covered·10⁶ div total` are all longs.
    *
    * '''Plan shape (the 100-TB design).''' Token counts are map-side
    * combined (vocab-scale rows after the first aggregate); the frequency
    * rank is a [[graft.operators.GroupedRank]] GLOBAL rank (range
    * partition, no single-task sort of the vocabulary); all requested
    * sizes then fold into ONE conditional aggregate — the curve costs one
    * job however many k's it evaluates. */
  def coverageCurve(
      df: DataFrame, textCol: String, vocabSizes: Seq[Int]): DataFrame = {
    require(vocabSizes.nonEmpty && vocabSizes.forall(_ > 0),
      "vocabSizes must be positive")
    require(vocabSizes.distinct.size == vocabSizes.size,
      "vocabSizes must be distinct")
    val counts = df
      .select(explode(TextStats.tokens(
        TextStats.normalizeText(col(textCol)))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("__graft_c"))
    val ranked = graft.operators.GroupedRank.withGroupRank(
      counts, Seq.empty, Seq(col("__graft_c").desc, col("token")), "__graft_r")
    val aggs = sum(col("__graft_c")).as("__graft_total") +:
      vocabSizes.map { kk =>
        coalesce(sum(when(col("__graft_r") <= kk, col("__graft_c"))), lit(0L))
          .as(s"__graft_cov_$kk")
      }
    ranked.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(vocabSizes.map { kk =>
        struct(lit(kk.toLong).as("vocab_size"),
          col(s"__graft_cov_$kk").as("covered_tokens"),
          col("__graft_total").as("total_tokens"))
      }: _*)).as("__graft_row"))
      .select(col("__graft_row.vocab_size").as("vocab_size"),
        col("__graft_row.covered_tokens").as("covered_tokens"),
        col("__graft_row.total_tokens").as("total_tokens"))
      .withColumn("coverage_ppm",
        expr("(covered_tokens * 1000000L) div total_tokens"))
  }

  /** BPE-style adjacent character-pair counts — the inner loop of byte-pair-
    * encoding tokenizer training: count every adjacent symbol pair across
    * the corpus weighted by word frequency; the highest-count pair is the
    * next merge. This computes the first-iteration pair statistics (symbols
    * = characters) over the normalized word stream, top `k` pairs with
    * deterministic count-then-pair ordering.
    *
    * '''Plan shape (the 100-TB design).''' Words aggregate FIRST (the
    * classic map-side-combined word count — a word repeated 10⁹ times
    * becomes one (word, n) row), then pairs explode per DISTINCT word: the
    * pair explosion runs over the vocabulary, not the corpus, so its cost
    * is corpus-size independent. Pair totals are an integer sum (exact,
    * engine-portable); top-k is `TakeOrderedAndProject` (per-partition
    * heaps, O(k) driver memory). No UDFs — `substr` over a position
    * sequence stays in codegen. */
  def bpePairCounts(df: DataFrame, textCol: String, k: Int = 20): DataFrame = {
    require(k > 0, "k must be positive")
    val words = df.select(
      explode(TextStats.tokens(TextStats.normalizeText(col(textCol)))).as("w"))
      .filter(length(col("w")) >= 2)
    val wordCounts = words.groupBy("w").agg(count(lit(1)).as("__wn"))
    wordCounts
      .select(col("__wn"), explode(transform(
        sequence(lit(1), length(col("w")) - 1),
        i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy("pair")
      .agg(sum("__wn").as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(k)
  }

  /** Full BPE merge training — `numMerges` iterations of the classic
    * byte-pair-encoding loop ([[bpePairCounts]] computes only iteration
    * one's statistics): count adjacent symbol pairs across the corpus
    * weighted by word frequency, adopt the highest-count pair as the next
    * merge (ties to the lexicographically smallest pair), rewrite the
    * vocabulary with the merged symbol, repeat. Returns the learned merge
    * table `(merge_rank, left, right, n)` — the tokenizer model.
    *
    * '''Plan shape (the 100-TB design).''' The corpus is scanned ONCE, into
    * the map-side-combined word histogram; every iteration then runs over
    * the DISTINCT-word table (vocabulary-scale, corpus-size independent).
    * Per iteration: one pair explode + exact integer aggregate, one
    * `TakeOrderedAndProject` top-1 (per-partition heaps, O(1) driver rows),
    * and one codegen'd `replace` over the encoded vocabulary. The adopted
    * merges are MODEL PARAMETERS — one row per iteration on the driver,
    * like the k-means centroids — and each iteration's vocabulary is
    * localCheckpointed so lineage stays flat across merges.
    *
    * '''Greedy-adjacency exactness.''' Symbols live bracket-delimited in
    * one string (`"<h><e><l><l><o>"`); a merge is a plain (non-regex)
    * global `replace("<l><l>" → "<ll>")`, which substitutes left-to-right
    * and non-overlapping — exactly BPE's greedy scan (`"<a><a><a>"` merges
    * the FIRST two) — and cannot match inside a multi-char symbol because
    * the brackets are part of the pattern. Plain `replace` has identical
    * semantics in every engine, so the whole training loop is exactly
    * SQL-replayable with unrolled CTEs. Normalized text is `[a-z0-9 ]`
    * only, so `<`/`>` can never collide with symbol content. */
  def bpeTrainMerges(
      df: DataFrame, textCol: String, numMerges: Int = 3,
      batch: Int = 1): DataFrame =
    bpeTrainMergesWithRounds(df, textCol, numMerges, batch)._1

  /** [[bpeTrainMerges]] plus the number of driver rounds the training loop
    * actually ran — the observable a batched-adoption caller sizes B by.
    *
    * '''Batched adoption (`batch` > 1).''' A production tokenizer adopts
    * tens of thousands of merges; one driver round-trip per merge is the
    * scale bottleneck (32k sequential Spark jobs). Per round this takes the
    * top-B pairs that form a pairwise symbol-disjoint PREFIX of the ranked
    * pair list and adopts them in one rewrite + one checkpoint. This is
    * EXACTLY equivalent to one-at-a-time greedy, by construction:
    *
    *  - The batch is a prefix of the (count DESC, pair ASC) ranking, cut at
    *    the first candidate sharing a symbol — left, right, or the merged
    *    concatenation — with an earlier adoption ("blocked"). So every
    *    blocked pair ranks strictly below every adopted pair.
    *  - Merging a batch pair cannot change the count of any pair disjoint
    *    from the batch's symbols, and any pair it CAN affect (grown or
    *    newly created, e.g. `(x, lr)` after `l+r`) decomposes each
    *    occurrence into one of at most 4 pre-batch adjacencies, every one
    *    of them blocked — so its count is bounded by 4× the best blocked
    *    count.
    *  - Adoption is therefore further truncated to candidates whose count
    *    strictly exceeds 4× the first blocked candidate's count (the
    *    ranking makes that the max over all blocked pairs; when the
    *    collected window is full, the tail count bounds everything unseen).
    *    Under that bound, sequential greedy provably picks the same pairs
    *    in the same order.
    *
    * Interacting corpora (natural text, where top pairs share symbols)
    * degrade gracefully to 1-pair rounds — identical to `batch = 1` — while
    * disjoint-heavy corpora adopt up to B per round, bounding driver rounds
    * by ~numMerges/B. */
  def bpeTrainMergesWithRounds(
      df: DataFrame, textCol: String, numMerges: Int = 3,
      batch: Int = 1): (DataFrame, Int) = {
    require(numMerges > 0, "numMerges must be positive")
    require(batch > 0, "batch must be positive")
    val spark = df.sparkSession
    val words = df.select(
      explode(TextStats.tokens(TextStats.normalizeText(col(textCol)))).as("w"))
      .filter(length(col("w")) >= 2)
    var vocab = words.groupBy("w").agg(count(lit(1)).as("__wn"))
      .select(concat(lit("<"),
          concat_ws("><", split(col("w"), "(?!$)")), lit(">")).as("enc"),
        col("__wn"))
      .localCheckpoint()
    val adopted = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var rounds = 0
    while (adopted.size < numMerges) {
      // the window only needs to cover the batch plus enough tail to locate
      // the first blocked candidate; model-scale rows either way
      val window = math.max(4 * batch, 16)
      val syms = regexp_extract_all(col("enc"), lit("<([^>]*)>"), lit(1))
      val top = vocab
        .select(col("__wn"), syms.as("__syms"))
        .filter(size(col("__syms")) >= 2)
        .select(col("__wn"), explode(transform(
          sequence(lit(1), size(col("__syms")) - 1),
          i => struct(element_at(col("__syms"), i).as("l"),
            element_at(col("__syms"), i + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("left"), col("p.r").as("right"))
        .agg(sum("__wn").as("n"))
        .orderBy(col("n").desc, col("left"), col("right"))
        .limit(window)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      require(top.nonEmpty,
        s"corpus exhausted after ${adopted.size} merges (no adjacent pairs left)")
      rounds += 1
      // disjoint-prefix scan: collect up to `batch` mutually disjoint
      // candidates, keep scanning only to locate the first blocked pair's
      // count (the truncation bound); unseen below-window pairs are bounded
      // by the window tail when the window came back full
      var blockedBound = if (top.length == window) top.last._3 else 0L
      val picks = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
      var taken = Set.empty[String]
      var stopped = false
      val it = top.iterator
      while (!stopped && it.hasNext) {
        val (l, r, n) = it.next()
        if (taken(l) || taken(r)) { blockedBound = n; stopped = true }
        else if (picks.size < batch) {
          picks += ((l, r, n))
          taken = taken + l + r + (l + r)
        }
      }
      // c_1 is greedy's pick by definition; later candidates survive only
      // with counts strictly above anything merge interference can produce
      val safe = picks.head +: picks.tail.takeWhile(_._3 > 4 * blockedBound)
      val roundMerges = safe.take(numMerges - adopted.size)
      val newEnc = roundMerges.foldLeft(col("enc")) { case (e, (l, r, _)) =>
        call_function("replace", e, lit(s"<$l><$r>"), lit(s"<$l$r>"))
      }
      vocab = vocab.withColumn("enc", newEnc).localCheckpoint()
      roundMerges.foreach { case (l, r, n) =>
        adopted += ((adopted.size.toLong, l, r, n))
      }
    }
    import spark.implicits._
    (adopted.toSeq.toDF("merge_rank", "left", "right", "n"), rounds)
  }

  /** Apply a trained merge table ([[bpeTrainMerges]] output, collected in
    * rank order) to tokenize the corpus — the SERVE side of the tokenizer:
    * encode each word as bracket-delimited characters and replay the merges
    * in rank order as plain `replace` calls, the same greedy left-to-right
    * non-overlapping scan the trainer used, so train and encode agree
    * symbol-for-symbol. Returns per-document token statistics
    * `(id, n_words, n_symbols)` — the corpus-level compression measurement
    * a tokenizer rollout is judged on (symbols/word falls as merges land).
    *
    * '''Plan shape (the 100-TB design).''' The merge table is a MODEL
    * PARAMETER (driver-side literals, like the k-means centroids): KB-scale
    * regardless of the corpus that trained it. Encoding runs over the
    * per-(doc, word) histogram — map-side combined, so a word repeated 10⁶
    * times in a doc is encoded once per doc, not per occurrence — and the
    * merge chain is a fixed stack of codegen'd plain `replace` calls: a
    * narrow map, no shuffle beyond the one per-doc aggregate. Symbol
    * counting is `len(enc) - len(replace(enc, "<", ""))` (one `<` per
    * symbol), pure integer string arithmetic, engine-portable. */
  def bpeEncode(
      df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val wordCounts = df.select(col(idCol).as("__graft_doc"),
      explode(TextStats.tokens(TextStats.normalizeText(col(textCol)))).as("w"))
      .groupBy("__graft_doc", "w")
      .agg(count(lit(1)).as("__graft_wc"))
    val enc0 = concat(lit("<"),
      concat_ws("><", split(col("w"), "(?!$)")), lit(">"))
    val encoded = merges.foldLeft(enc0) { case (e, (l, r)) =>
      call_function("replace", e, lit(s"<$l><$r>"), lit(s"<$l$r>"))
    }
    val nSym = length(encoded) -
      length(call_function("replace", encoded, lit("<"), lit("")))
    wordCounts
      .withColumn("__graft_sym", nSym)
      .groupBy("__graft_doc")
      .agg(sum("__graft_wc").as("n_words"),
        sum(col("__graft_wc") * col("__graft_sym")).as("n_symbols"))
      .withColumnRenamed("__graft_doc", idCol)
  }

  /** Per-document out-of-vocabulary statistics against a vocabulary frame
    * (typically [[topTokens]] output, or an external token list): token
    * occurrences, OOV occurrences, and the OOV rate — the coverage check
    * run before committing to a tokenizer/vocabulary. The vocabulary is a
    * model parameter (k rows, broadcast); counting is one explode + one
    * map-side-combined aggregate. Documents with no tokens are absent from
    * the output (no occurrences to rate). */
  def oovCounts(
      df: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, tokenCol: String = "token"): DataFrame = {
    val toks = df.select(col(idCol),
      explode(TextStats.tokens(TextStats.normalizeText(col(textCol)))).as("__graft_tok"))
    val v = vocab.select(col(tokenCol).as("__graft_tok"))
      .distinct().withColumn("__graft_in_v", lit(true))
    toks
      .join(broadcast(v), Seq("__graft_tok"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__graft_in_v").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate", col("n_oov").cast("double") / col("n_tokens"))
  }

  /** PMI-style collocation mining: the adjacent word pairs whose observed
    * co-occurrence most exceeds the independence expectation — the standard
    * multiword-expression detector ("new york", "machine learning") run
    * before vocabulary construction so strong collocations can become
    * single tokens. Scored as the exact integer LIFT in ppm,
    * `lift_ppm = (c_xy · N · 10⁶) div (c_x · c_y)` (PMI is `log` of the
    * same rational, so the ranking is identical and no libm call exists in
    * either engine); `c_x`/`c_y` are unigram occurrence counts, `N` the
    * corpus token total, `c_xy` the adjacent-pair count. The numerator
    * reaches ~10¹⁹ at corpus scale, so the arithmetic runs in
    * decimal(38,0) (HUGEINT in the oracle). Pairs below `minCount` are
    * noise-floored out BEFORE scoring (a 2-occurrence pair of two hapaxes
    * would otherwise top any lift ranking); ties rank by (w1, w2).
    *
    * '''Plan shape (the 100-TB design).''' One tokenize pass feeds both
    * frames: unigram counts (map-side combined, vocab-grain) and adjacent
    * pairs via an index-zip `transform` over each doc's own token array
    * (never a positions self-join). The two unigram lookups are joins of
    * the pair frame (vocab²-grain, minCount-pruned) against the vocab-grain
    * count frame; the final top-k is `TakeOrderedAndProject` — no global
    * sort. */
  def pmiCollocations(
      df: DataFrame, textCol: String,
      minCount: Long = 5L, k: Int = 25): DataFrame = {
    require(minCount >= 1, "minCount must be >= 1")
    require(k > 0, "k must be positive")
    val toks = df.select(
      TextStats.tokens(TextStats.normalizeText(col(textCol))).as("__graft_toks"))
    val uni = toks.select(explode(col("__graft_toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val totals = uni.agg(sum("c").as("__graft_n"))
    val pairs = toks
      .filter(size(col("__graft_toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(__graft_toks) - 2)," +
          " i -> struct(__graft_toks[i] as w1, __graft_toks[i + 1] as w2))"))
        .as("__graft_p"))
      .select(col("__graft_p.w1").as("w1"), col("__graft_p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minCount)
    pairs
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), Seq("w2"))
      .crossJoin(broadcast(totals))
      .withColumn("lift_ppm", expr(
        "cast((cast(n_pair as decimal(38,0)) * __graft_n * 1000000) div" +
          " (cast(c1 as decimal(38,0)) * c2) as bigint)"))
      .select("w1", "w2", "n_pair", "c1", "c2", "lift_ppm")
      .orderBy(col("lift_ppm").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Zipf-law frequency-spectrum histogram: the vocabulary censused by
    * floor-log2 occurrence-count bucket — how many distinct tokens occur
    * 1×, 2–3×, 4–7×, …, and what share of all token mass each bucket
    * carries. The log-log shape IS the Zipf evidence (a natural corpus
    * walks down roughly linearly; template spam shows as a mass bulge in
    * one high bucket), and the bucket-1 row is the hapax count that drives
    * vocabulary-size planning. Bucket = `length(bin(c)) − 1` — the shared
    * no-float floor-log2 idiom (no `log2` libm call to drift between
    * engines). One explode + two map-side-combined aggregates; the second
    * runs on the vocab-grain frame, never the corpus. */
  def zipfHistogram(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(
        TextStats.tokens(TextStats.normalizeText(col(textCol)))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .withColumn("bucket", expr("cast(length(bin(c)) - 1 as bigint)"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_tokens"), sum("c").as("n_occurrences"),
        min("c").as("min_count"), max("c").as("max_count"))
}
