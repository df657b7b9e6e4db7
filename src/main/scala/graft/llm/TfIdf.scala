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
