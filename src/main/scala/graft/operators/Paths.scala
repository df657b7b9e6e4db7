package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Whole-journey path census — the full-sequence face of the path family:
  * [[Transitions]] counts one-hop (from, to) pairs; this counts COMPLETE
  * per-entity-per-window state sequences ("view>click>purchase"), the
  * "what are the top journeys" question behind conversion-path reports
  * and UX funnels-you-didn't-think-to-define.
  *
  * '''Determinism contract.''' The per-window sequence is ordered by
  * `(tsCol, tieCol)` with `tieCol` unique per row, so the path string is a
  * total-order fold — bit-identical to any engine's
  * `string_agg(state, sep ORDER BY ts, tie)`. State values must not
  * contain the separator (enforced per row with `raise_error`: a silent
  * collision would alias two different journeys into one path).
  *
  * '''Plan shape (100 TB).''' One map-side-combined shuffle to the
  * (entity, window) grain — `sort_array(collect_list(struct(ts, tie,
  * state)))` is the standard bounded-per-key fold (same residency
  * assumption as every per-user window in this repo), then the path
  * strings aggregate map-side to the census (|distinct paths| rows, domain
  * scale). No corpus-grain window, no self-join; top-k cut runs on the
  * census frame.
  */
object Paths {

  /** Per-path census `(path, n_windows, n_entities)` over (entity, window)
    * journeys: how many windows walked each exact sequence and how many
    * distinct entities did. `sep` must appear in no state value. */
  def pathCensus(
      events: DataFrame,
      entityCol: String,
      windowCol: Column,
      stateCol: String,
      tsCol: String,
      tieCol: String,
      sep: String = ">"): DataFrame = {
    val guarded = when(col(stateCol).isNull || col(stateCol).contains(sep),
      raise_error(concat(lit(s"pathCensus: state null or contains '$sep': "),
        coalesce(col(stateCol), lit("null"))))).otherwise(col(stateCol))
    events
      .select(col(entityCol).as("__e"), windowCol.as("__w"),
        col(tsCol).as("__ts"), col(tieCol).as("__tie"), guarded.as("__s"))
      .groupBy(col("__e"), col("__w"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("__ts"), col("__tie"), col("__s")))),
        p => p("__s")), sep).as("path"))
      .groupBy("path")
      .agg(count(lit(1)).as("n_windows"),
        count_distinct(col("__e")).as("n_entities"))
  }
}
