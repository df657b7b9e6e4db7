package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-size document chunking with overlap: the context-window shaping
  * primitive (RAG indexing, long-document training splits). Each document
  * becomes ⌈(n_tokens − overlap) / step⌉ chunks of up to `chunkTokens`
  * tokens, consecutive chunks sharing `overlap` tokens.
  *
  * North-star extension surface (SURVEY.md §2.4 family). Scale shape: pure
  * narrow map + explode — no shuffle at all; chunk ids derive from the
  * chunk's start offset (never from explode ordinals, which would be an
  * execution property), so output is deterministic under any partitioning.
  */
object Chunker {

  import TextStats.{normalizeText, tokens}

  /** One row per chunk: (`idCol`, chunk_id, n_chunk_tokens, chunk_text).
    * Chunks start at token offsets 1, 1+step, 1+2·step, … while the start
    * is ≤ max(n_tokens − overlap, 1), where `step = chunkTokens − overlap`;
    * the final chunk may be short. An empty document yields one empty
    * chunk (chunk_id 0), and a NULL document one chunk row with NULL
    * tokens/text (NULL stays distinguishable from empty) — documents
    * never vanish silently. */
  def chunkDocuments(
      df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int = 40, overlap: Int = 8): DataFrame = {
    require(chunkTokens > overlap && overlap >= 0,
      s"need chunkTokens > overlap >= 0, got $chunkTokens/$overlap")
    val step = chunkTokens - overlap
    val toksDf = df.select(col(idCol).as("id"),
      tokens(normalizeText(col(textCol))).as("__toks"))
    // starts live in the same projection as a second __toks reference, so
    // CollapseProject cannot inline the tokenization into later consumers
    // (BENCH_NOTES lesson 2); explode_outer avoids the inferred-filter
    // pushdown that re-derives the generator expression per row (the
    // decontaminate lesson) — starts is never empty anyway.
    val withStarts = toksDf.select(col("id"), col("__toks"),
      sequence(lit(1), greatest(size(col("__toks")) - overlap, lit(1)),
        lit(step)).as("__starts"))
    withStarts
      .select(col("id"), col("__toks"), explode_outer(col("__starts")).as("__start"))
      .select(col("id"), col("__start"),
        slice(col("__toks"), col("__start"), lit(chunkTokens)).as("__chunk"))
      .select(
        col("id").as(idCol),
        ((col("__start") - 1) / step).cast("long").as("chunk_id"),
        size(col("__chunk")).cast("long").as("n_chunk_tokens"),
        array_join(col("__chunk"), " ").as("chunk_text"))
  }
}
