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
}
