package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-anonymity / l-diversity audit over a quasi-identifier column set —
  * the pre-release governance gate: "can any row be singled out by these
  * externally-knowable columns, and do the small groups leak a sensitive
  * attribute". Run before publishing a derived table or handing a
  * training corpus to a third party.
  *
  * Per quasi-identifier group: its size `n`, the number of DISTINCT
  * sensitive values `l` (l-diversity — a group can be size ≥ k yet still
  * leak if every member shares one sensitive value), and the
  * `below_k` flag. k-anonymity holds iff no group is below k.
  *
  * '''Plan shape (100 TB).''' ONE aggregate over the scan
  * (count + count-distinct per QI group — Spark plans the distinct as a
  * two-phase partial expand, still group-grain through the exchange);
  * NULL QI values are ordinary group members (groupBy semantics — NULL
  * is exactly how a suppressed cell arrives). No window, no collect. */
object Anonymity {

  /** One row per QI group: `qiCols`, `n`, `l_sensitive`, `below_k`. */
  def kAnonymityAudit(
      df: DataFrame,
      qiCols: Seq[String],
      sensitiveCol: String,
      k: Long): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, s"k must be >= 1, got $k")
    df.groupBy(qiCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col(sensitiveCol)).as("l_sensitive"))
      .withColumn("below_k", col("n") < k)
  }
}
