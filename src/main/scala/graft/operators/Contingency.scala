package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact χ² association between two categorical columns (contingency
  * table) plus Cramér's V² — "is language mix a property of the source",
  * "does event type depend on user segment" — asked before stratifying
  * on either column.
  *
  * '''Exactness.''' χ² = Σ (n·O − r·c)² / (n·r·c) over ALL cells of the
  * table — including the O = 0 cells the groupBy cell frame never
  * materializes, each contributing its expectation r·c/n. Those absent
  * cells are folded in algebraically: Σ_all r·c = (Σr)(Σc) = n², so
  * Σ_absent r·c/n = n − Σ_present r·c/n and
  * `χ² = Σ_present [(n·O − r·c)²/(n·r·c) − r·c/n] + n` — cell-sparse
  * compute, dense-table semantics. Reported in ppm with both per-cell
  * divisions truncated '''per cell''' (an order-independent integer sum —
  * any SQL engine replays it). Cramér's V² ppm is then
  * `chi2_ppm div (n·(min(rows,cols) − 1))`. All arithmetic decimal(38,0);
  * exact while `n·max(O) < 10¹⁶` (≈10⁹ rows with balanced margins — the
  * statistic saturates long before the bound binds).
  *
  * '''Plan shape (100 TB).''' ONE corpus aggregate (the |A|·|B|-bounded
  * cell frame, materialized since every margin derives from it); row
  * margins, column margins, and totals are cell-grain re-aggregates
  * broadcast back, then one cell-grain fold. No window, no collect, no
  * second corpus scan. */
object Contingency {

  /** One row: `n_rows`, `n_a` (distinct `colA`), `n_b` (distinct `colB`),
    * `chi2_ppm`, `v2_ppm`. NULL association when either column is
    * constant (min cardinality 1). */
  def chiSquaredAssoc(df: DataFrame, colA: String, colB: String): DataFrame = {
    // |A|·|B| rows with four consumers — materialize so the corpus is
    // scanned exactly once however many margins re-aggregate it
    val cells = df.groupBy(colA, colB).agg(count(lit(1)).as("__o"))
      .localCheckpoint()
    // NULL-SAFE margin joins: groupBy treats NULL as an ordinary
    // category, so the joins back must too (same contract as
    // GroupedRank's offset join) — plain equi-joins would silently drop
    // every NULL-category cell from the statistic
    val rowsM = cells.groupBy(col(colA).as("__ra")).agg(sum("__o").as("__r"))
    val colsM = cells.groupBy(col(colB).as("__cb")).agg(sum("__o").as("__c"))
    // countDistinct skips NULLs — add the NULL category back if present
    val tot = cells.agg(sum("__o").as("__n"),
      (countDistinct(colA) +
        max(when(col(colA).isNull, 1L).otherwise(0L))).as("__na"),
      (countDistinct(colB) +
        max(when(col(colB).isNull, 1L).otherwise(0L))).as("__nb"))
    cells.join(broadcast(rowsM), col(colA) <=> col("__ra"))
      .join(broadcast(colsM), col(colB) <=> col("__cb"))
      .crossJoin(broadcast(tot))
      .withColumn("__d", expr(
        "cast(__n as decimal(38,0)) * __o -" +
          " cast(__r as decimal(38,0)) * __c"))
      .withColumn("__term", expr(
        "(__d * __d * 1000000) div" +
          " (cast(__n as decimal(38,0)) * __r * __c)"))
      // the expectation mass this present cell carries — subtracted so
      // the +n·10⁶ constant can stand in for every absent cell's E
      .withColumn("__exp", expr(
        "(cast(__r as decimal(38,0)) * __c * 1000000) div __n"))
      .agg(
        max("__n").cast("long").as("n_rows"),
        max("__na").cast("long").as("n_a"),
        max("__nb").cast("long").as("n_b"),
        expr("cast(sum(__term) - sum(__exp) +" +
          " cast(max(__n) as decimal(38,0)) * 1000000 as bigint)")
          .as("chi2_ppm"),
        expr("cast(case when least(max(__na), max(__nb)) < 2 then null" +
          " else (sum(__term) - sum(__exp) +" +
          " cast(max(__n) as decimal(38,0)) * 1000000)" +
          " div (cast(max(__n) as decimal(38,0)) *" +
          " (least(max(__na), max(__nb)) - 1)) end as bigint)").as("v2_ppm"))
  }
}
