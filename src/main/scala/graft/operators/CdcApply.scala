package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC changelog application: fold a stream-table of keyed mutations
  * (insert/update/delete, each with a monotone sequence number) into a
  * base snapshot, last-writer-wins per key — the read-side "merge the
  * day's CDC feed" primitive complementing [[Scd2]] (which folds FULL
  * snapshots; a changelog is the usual shape when the upstream emits
  * deltas, e.g. a crawl frontier or an ops database).
  *
  * Changelog schema contract: `keyCols ++ attrCols ++ (op STRING, seq
  * LONG)`, with `op ∈ {I, U, D}` (I and U both upsert — idempotent
  * replays don't care whether the key existed) and `(key, seq)` unique —
  * seq is the total order that makes "last" well-defined.
  *
  * '''Plan shape (the 100-TB design).''' "Latest op per key" is a
  * [[GroupedTopK]] k=1 aggregate on descending seq — ≤ 1 row of partial
  * state per (key, map partition) through the one exchange, so a hot key
  * with 10⁹ churned versions ships one row per map task, never its
  * history (the window-rank formulation ships and sorts everything).
  * Then ONE full-outer equi-join against the base applies it: base-only
  * keys pass through, D drops, I/U replace. No window, no driver state.
  */
object CdcApply {

  /** `base` with the latest mutation per key applied. Output schema =
    * `keyCols ++ attrCols`. */
  def applyChangelog(
      base: DataFrame,
      changelog: DataFrame,
      keyCols: Seq[String],
      attrCols: Seq[String],
      opCol: String = "op",
      seqCol: String = "seq"): DataFrame = {
    require(keyCols.nonEmpty, "cdc apply needs at least one key column")
    val logCols = keyCols ++ attrCols ++ Seq(opCol, seqCol)
    // bounded-state per-key argmax: k=1 under descending seq
    val last = GroupedTopK.topKPerGroup(
      changelog.select(logCols.map(col): _*),
      keyCols, Seq(col(seqCol)), 1, "__cdc_rank", ascending = false)
      .drop("__cdc_rank")
    val lastR = logCols.foldLeft(last) { (d, c) =>
      d.withColumnRenamed(c, s"__c_$c")
    }
    // null-safe: a NULL key is a legal (single) key
    val cond = keyCols.map(c => col(c) <=> col(s"__c_$c")).reduce(_ && _)
    val applied = base.join(lastR, cond, "full_outer")
      .filter(coalesce(col(s"__c_$opCol") =!= "D", lit(true)))
    applied.select(
      keyCols.map(c => coalesce(col(s"__c_$c"), col(c)).as(c)) ++
        attrCols.map(c =>
          when(col(s"__c_$opCol").isNotNull, col(s"__c_$c"))
            .otherwise(col(c)).as(c)): _*)
  }
}
