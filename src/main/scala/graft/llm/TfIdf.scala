package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF-style distinctive-term extraction: for each document, the top-k
  * terms ranked by `tf / df` — term frequency in the document over the
  * number of corpus documents containing the term. Keyword extraction /
  * topic tagging for training-data curation.
  *
  * The weight is `tf/df` rather than the classic `tf · log(N/df)`: the same
  * "frequent here, rare elsewhere" signal, but a SINGLE IEEE division of two
  * exact integers — bit-reproducible across engines, where a `log` differs
  * in the last ulp between libm implementations and an exact oracle cannot
  * tolerate that.
  *
  * '''Plan shape.''' explode → two hash aggregations (per-(doc,term) tf,
  * per-term df — both map-side combined) → equi-join on term → per-doc
  * top-k window. The window partitions by document (bounded group size =
  * distinct terms per doc); the term join is a plain shuffle equi-join —
  * no broadcast of the term dictionary, which at corpus scale is large.
  * Ties rank deterministically by term text.
  */
object TfIdf {

  /** Distinctive vocabulary PER GROUP (source/domain/shard): terms ranked
    * by the exact integer rate ratio
    * `score_ppm = c·(G−S)·10⁶ div (S·(T−c+1))` — the term's in-group rate
    * over its rest-of-corpus rate (`c` in-group count, `S` group tokens,
    * `T` corpus-wide term count, `G` corpus tokens; `+1` add-one-smooths
    * the rest so group-exclusive terms rank finite-first instead of
    * dividing by zero). The corpus-profiling question "what does src7
    * talk about that nothing else does", with no floats and no log.
    *
    * '''Plan shape (100 TB).''' explode → one (group, term) count pass →
    * term-total equi-join (shuffle on term — the term dictionary is too
    * big to broadcast) + broadcast of the #groups totals and the 1-row
    * grand total → bounded-state [[graft.operators.GroupedTopK]] (≤ k
    * rows per group × map task; never a rank-everything window). */
  def distinctiveTerms(
      df: DataFrame, groupCol: String, textCol: String, k: Int = 5): DataFrame = {
    // localCheckpoint: three consumers (scores, group totals, term totals)
    // and column pruning differentiates their aggregate subtrees, so
    // ReusedExchange can't collapse them — without this the corpus
    // explode+count pass runs three times. The frame is (group, term)
    // grain — the vocabulary cross, far below corpus scale.
    val counts = df.select(col(groupCol).as("__g"),
      explode(TextStats.tokens(TextStats.normalizeText(col(textCol)))).as("term"))
      .groupBy("__g", "term").agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val srcTot = counts.groupBy("__g").agg(sum("n").as("__st"))
    val tokTot = counts.groupBy("term").agg(sum("n").as("__tt"))
    val grand = srcTot.agg(sum("__st").as("__gt"))
    val scored = counts
      .join(tokTot, Seq("term"))
      .join(broadcast(srcTot), Seq("__g"))
      .crossJoin(broadcast(grand))
      .withColumn("score_ppm", expr(
        "(cast(n as decimal(38,0)) * (__gt - __st) * 1000000) div " +
          "(cast(__st as decimal(38,0)) * (__tt - n + 1))"))
      .select(col("__g").as(groupCol), col("term"), col("n"), col("score_ppm"))
    graft.operators.GroupedTopK.topKPerGroup(
      scored, Seq(groupCol), Seq(-col("score_ppm"), col("term")), k)
  }

  def topTerms(df: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
      explode(TextStats.tokens(TextStats.normalizeText(col(textCol)))).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df_docs"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    tf.join(dfreq, Seq("term"))
      .withColumn("score", col("tf").cast("double") / col("df_docs"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("doc_id", "term", "tf", "df_docs", "score", "rank")
  }
}
