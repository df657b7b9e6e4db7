package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverted-index construction and BM25 retrieval — the index side of a
  * retrieval-augmented pipeline (and of dedup-by-query / decontamination
  * tooling): term → postings with term frequency and first position, plus
  * a top-k BM25 scorer over the same tokenizer. North-star extension
  * surface (SURVEY.md §2.4 family).
  *
  * '''Determinism.''' BM25 classically multiplies by `log`-idf; the last
  * ulp of `log` is libm-dependent, so (like [[TfIdf]]) the scorer uses the
  * RATIONAL Robertson idf `(N − df + ½)/(df + ½)` — the same
  * rare-term-wins ordering, but only IEEE +, ×, ÷ on exact integers, which
  * every engine rounds identically. Per-term contributions are floored to
  * integer micro-scores BEFORE the per-document sum, so the aggregate is
  * exact long arithmetic — immune to FP summation-order nondeterminism
  * (a double `sum()` over a shuffled corpus is not reproducible even
  * within one engine).
  *
  * '''Plan shape (100-TB).''' Postings: one posexplode → one
  * map-side-combined aggregate keyed (term, doc) — never a per-term
  * window. Scoring: query terms are filtered INSIDE the token array
  * (higher-order `filter`) before the explode, so the shuffle carries only
  * matching tokens, not the corpus; document lengths come from `size()`
  * without any explode; the df table (≤ #query terms rows) and the global
  * length stats (1 row) broadcast; the final top-k is a global
  * [[graft.operators.GroupedRank]] — no single-task full sort.
  */
object InvertedIndex {

  /** Postings list: one row per (term, document) with `tf` (occurrences in
    * the doc) and `first_pos` (0-based token offset of the first one —
    * what phrase/proximity scoring needs). Tokenization matches
    * [[TfIdf.topTerms]] ([[TextStats.normalizeText]] + whitespace). */
  def postings(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
      posexplode(TextStats.tokens(TextStats.normalizeText(col(textCol))))
        .as(Seq("pos", "term")))
    toks.groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"), min("pos").cast("long").as("first_pos"))
  }

  /** Top-k documents for a bag-of-terms query under rational-idf BM25.
    * Returns `(doc_id, score_micro, rank)` — `score_micro` is the exact
    * integer Σ ⌊10⁶ · idf_r(t) · tf·(k1+1)/(tf + k1·(1−b+b·len/avglen))⌋
    * over matched query terms. `k1Micro`/`bMicro` are the classic BM25
    * parameters in micro-units (defaults 1.2 / 0.75). */
  def bm25TopK(
      df: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k: Int = 10,
      k1Micro: Long = 1200000L,
      bMicro: Long = 750000L): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(queryTerms.distinct.size == queryTerms.size,
      "queryTerms must be distinct (duplicates would double-count idf)")
    val k1 = lit(k1Micro.toDouble / 1e6)
    val b = lit(bMicro.toDouble / 1e6)
    val toks = TextStats.tokens(TextStats.normalizeText(col(textCol)))
    val base = df.select(col(idCol).as("doc_id"), toks.as("__graft_toks"))
      .withColumn("__graft_len", size(col("__graft_toks")).cast("long"))
    // 1-row global stats and the ≤|query| df table both broadcast; the
    // explode below carries ONLY query-term hits, not the corpus
    val stats = base.agg(sum("__graft_len").as("__graft_totlen"),
      count(lit(1)).as("__graft_n"))
    val hits = base.select(col("doc_id"), col("__graft_len"),
      explode(filter(col("__graft_toks"),
        t => t.isInCollection(queryTerms))).as("term"))
    val tf = hits.groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), max("__graft_len").as("len"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df_docs"))
    val contrib = tf
      .join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("__graft_avglen",
        col("__graft_totlen").cast("double") / col("__graft_n"))
      .withColumn("__graft_idf",
        (col("__graft_n") - col("df_docs") + lit(0.5)) /
          (col("df_docs") + lit(0.5)))
      .withColumn("__graft_tfn",
        col("tf") * (k1 + lit(1.0)) /
          (col("tf") + k1 * (lit(1.0) - b +
            b * (col("len").cast("double") / col("__graft_avglen")))))
      .withColumn("__graft_c",
        floor(col("__graft_idf") * col("__graft_tfn") * lit(1000000.0)))
    val scored = contrib.groupBy("doc_id")
      .agg(sum("__graft_c").as("score_micro"))
    graft.operators.GroupedRank.withGroupRank(
      scored, Seq(), Seq(col("score_micro").desc, col("doc_id")), "rank")
      .filter(col("rank") <= k)
  }
}
