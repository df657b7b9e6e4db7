package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff: classify every document id across two corpus
  * versions as `added` / `removed` / `changed` / `unchanged` by comparing
  * content fingerprints. The audit step between two materializations of a
  * 100-TB corpus — "what did this pipeline change?" — and the input to
  * incremental downstream recomputation (re-embed / re-tokenize only the
  * `added`+`changed` slice instead of the whole corpus).
  *
  * '''Plan shape (100-TB).''' Each side is reduced to `(id, md5)` BEFORE
  * the join, so the full-outer shuffle ships 16-byte fingerprints, never
  * document bodies — the same discipline as [[Dedup.dropExactDuplicates]].
  * The join is a plain equi-join on the id (hash-partitioned both sides,
  * AQE-skew-splittable); classification is a codegen'd CASE over null-ness
  * and fingerprint equality. North-star extension surface (SURVEY.md §2.4
  * family; the reference library has no corpus-versioning story).
  */
object CorpusDiff {

  /** One row per id present in either snapshot: `(idCol, status)` with
    * `status ∈ {added, removed, changed, unchanged}`. Fingerprints are
    * md5 over the RAW text — a diff must be exact; callers that want
    * whitespace-insensitive diffs normalize before calling (e.g.
    * [[TextStats.normalizeText]]). */
  def diff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val o = oldDf.select(col(idCol).as("__graft_old_id"),
      md5(col(textCol)).as("__graft_old_fp"))
    val n = newDf.select(col(idCol).as("__graft_new_id"),
      md5(col(textCol)).as("__graft_new_fp"))
    o.join(n, col("__graft_old_id") === col("__graft_new_id"), "full_outer")
      .select(
        coalesce(col("__graft_old_id"), col("__graft_new_id")).as(idCol),
        when(col("__graft_old_id").isNull, "added")
          .when(col("__graft_new_id").isNull, "removed")
          .when(col("__graft_old_fp") === col("__graft_new_fp"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Diff summary: row counts and id checksums per status — the compact
    * drift report a pipeline run logs (and an oracle can replay) without
    * materializing the full id list. */
  def diffSummary(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      textCol: String): DataFrame =
    diff(oldDf, newDf, idCol, textCol)
      .groupBy("status")
      .agg(count(lit(1)).as("n_docs"), sum(col(idCol)).as("sum_ids"))
}
