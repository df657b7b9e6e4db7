package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 maintenance: fold a new full snapshot
  * into a versioned history table, closing changed/deleted rows and
  * opening new versions — the apply-side of corpus/dimension versioning
  * ([[graft.llm.CorpusDiff]] is the report-side; this materializes the
  * history a reproducible training run reads "as of" a version).
  *
  * History schema contract: `keyCols ++ attrCols ++ (valid_from LONG,
  * valid_to LONG nullable, is_current BOOLEAN)`; an open row has
  * `valid_to = NULL, is_current = true`. Exactly one current row per key.
  *
  * Semantics at `version = T` (for each key):
  *  - current row, attrs unchanged → row passes through untouched;
  *  - current row, attrs changed   → row closed (`valid_to = T`,
  *    `is_current = false`) + new open row (`valid_from = T`);
  *  - key absent from snapshot     → row closed (deletion);
  *  - key new in snapshot          → new open row.
  * Historical (non-current) rows always pass through untouched.
  *
  * '''Plan shape (the 100-TB design).''' Change detection is an md5
  * fingerprint over the attr columns computed on BOTH sides before the
  * one full-outer equi-join on the key — equality tests never compare
  * wide payloads, and the non-current partition of the history never
  * enters the join at all (it unions straight through). The 0-2 output
  * rows per joined key are emitted by one explode over a 2-slot array —
  * no second join pass, no window, no driver state. At warehouse scale
  * pair this with key-bucketed storage so only changed buckets rewrite;
  * the declarative core here is storage-agnostic.
  */
object Scd2 {

  /** Boundary-unambiguous fingerprint: each attr encodes as
    * `<charlen>:<value>` (NULL maps to a lone `\\u0000` sentinel, distinct
    * from every length-prefixed value), then the parts concatenate. The
    * length prefix makes shifted boundaries like ("ab","c") vs ("a","bc")
    * and embedded separator bytes hash differently; NULL vs empty string
    * is also distinct (`\\u0000` vs `0:`). */
  private def fp(attrCols: Seq[String], of: String => Column): Column = {
    val parts = attrCols.map { c =>
      val s = of(c).cast("string")
      when(s.isNull, lit("\u0000"))
        .otherwise(concat(length(s).cast("string"), lit(":"), s))
    }
    md5(concat(parts: _*))
  }

  /** New complete history = `history` folded with `snapshot` at `version`.
    * `snapshot` must carry `keyCols ++ attrCols`; output schema equals the
    * history schema. The fingerprint is boundary- and NULL-unambiguous
    * (see [[fp]]): NULL↔empty-string flips and boundary-shifted attr
    * tuples are all detected as real changes. */
  def mergeSnapshot(
      history: DataFrame,
      snapshot: DataFrame,
      keyCols: Seq[String],
      attrCols: Seq[String],
      version: Long): DataFrame = {
    require(keyCols.nonEmpty, "scd2 needs at least one key column")
    require(attrCols.nonEmpty, "scd2 needs at least one attribute column")
    val outCols = keyCols ++ attrCols ++ Seq("valid_from", "valid_to", "is_current")
    val past = history.filter(!col("is_current")).select(outCols.map(col): _*)
    val cur = history.filter(col("is_current"))
      .select((keyCols ++ attrCols).map(c => col(c).as(s"__h_$c")) ++
        Seq(col("valid_from").as("__h_valid_from")) :+
        fp(attrCols, c => col(s"__h_$c")).as("__h_fp"): _*)
    val snap = snapshot
      .select((keyCols ++ attrCols).map(c => col(c).as(s"__s_$c")) :+
        fp(attrCols, c => col(s"__s_$c")).as("__s_fp"): _*)
    // null-safe key equality: a NULL key is a legal (single) dimension key
    val cond = keyCols.map(c => col(s"__h_$c") <=> col(s"__s_$c")).reduce(_ && _)
    val joined = cur.join(snap, cond, "full_outer")
    val hExists = col("__h_fp").isNotNull
    val sExists = col("__s_fp").isNotNull
    val changed = hExists && sExists && col("__h_fp") =!= col("__s_fp")
    def rowStruct(side: String, from: Column, to: Column, current: Column) =
      struct((keyCols ++ attrCols).map(c => col(s"__${side}_$c").as(c)) ++
        Seq(from.as("valid_from"), to.as("valid_to"), current.as("is_current")): _*)
    // slot 1: the surviving-or-closed CURRENT row; slot 2: the new version
    val keptOrClosed = when(hExists && sExists && !changed,
        rowStruct("h", col("__h_valid_from"), lit(null).cast("long"), lit(true)))
      .when(hExists && (changed || !sExists),
        rowStruct("h", col("__h_valid_from"), lit(version), lit(false)))
    val opened = when(sExists && (changed || !hExists),
      rowStruct("s", lit(version), lit(null).cast("long"), lit(true)))
    val merged = joined
      .select(explode(array(keptOrClosed, opened)).as("__r"))
      .filter(col("__r").isNotNull)
      .select(outCols.map(c => col(s"__r.$c").as(c)): _*)
    past.unionAll(merged)
  }
}
