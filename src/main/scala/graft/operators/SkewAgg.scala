package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-safe HOLISTIC aggregations: per-key results that need every value of
  * the key (sorted value lists, exact distinct counts, the mode). A plain
  * `groupBy(key)` funnels each key's entire value stream through one reducer
  * — for a hot key in a 100-TB corpus that is one task holding (and sorting)
  * billions of values. Algebraic aggregates (sum/count/min/max) don't have
  * this problem (map-side partial aggregation bounds reducer input); these
  * operators restore the same property for three common holistic shapes by
  * inserting a first shuffle whose key is (key, salt) or (key, value) — a
  * hot KEY spreads over many first-stage reducers, and the second stage
  * merges a bounded number of pre-reduced rows per key.
  *
  * The reference engine has only algebraic aggregation (skew joins +
  * sketches); north-star extension surface (SURVEY.md §2.4 family).
  */
object SkewAgg {

  /** Per-key SORTED value list (as an array), built in two stages:
    *
    *  1. `groupBy(key, salt)` with `salt = hash(value) % numSalts` —
    *     per-(key,salt) partial `collect_list`; a hot key's values spread
    *     over `numSalts` reducers, each holding ~1/numSalts of them;
    *  2. `groupBy(key)` over the ≤ numSalts partial lists per key —
    *     `flatten` + one `array_sort` of the final list.
    *
    * The stage-2 reducer still materializes the full per-key list (that IS
    * the requested result — unavoidable for an exact sorted list); what the
    * salting removes is the skew in stage-1 SHUFFLE and combine work, which
    * no longer concentrates a hot key's raw stream onto one task. Null
    * values are excluded (SQL aggregate convention). Output:
    * `keyCols…, values (sorted array), n_values`.
    */
  def sortedListAgg(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      numSalts: Int = 32): DataFrame = {
    require(keyCols.nonEmpty, "sortedListAgg requires at least one key column")
    require(numSalts > 0, "numSalts must be positive")
    val keys = keyCols.map(col)
    df.filter(col(valueCol).isNotNull)
      .withColumn("__graft_salt", pmod(hash(col(valueCol)), lit(numSalts)))
      .groupBy(keys :+ col("__graft_salt"): _*)
      .agg(collect_list(col(valueCol)).as("__graft_part"))
      .groupBy(keys: _*)
      .agg(array_sort(flatten(collect_list(col("__graft_part")))).as("values"))
      .withColumn("n_values", size(col("values")).cast("long"))
  }

  /** Exact per-key COUNT DISTINCT plus total row count, two-stage:
    * `groupBy(key, value)` dedups — a hot key spreads over as many reducers
    * as it has distinct values — then `groupBy(key)` counts the surviving
    * (key, value) rows. Equivalent to `count(DISTINCT value)`, but with an
    * explicit scale-safe shuffle shape (Spark's own DISTINCT aggregate
    * plans the same Expand + two-aggregate form; this operator is the
    * composable building block that also yields the per-value counts).
    * Nulls: distinct count excludes null values; `n_rows` counts all rows.
    * Output: `keyCols…, n_distinct, n_rows`.
    */
  def countDistinctExact(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "countDistinctExact requires at least one key column")
    val keys = keyCols.map(col)
    df.groupBy(keys :+ col(valueCol): _*)
      .agg(count(lit(1)).as("__graft_c"))
      .groupBy(keys: _*)
      .agg(
        count(col(valueCol)).as("n_distinct"),
        sum(col("__graft_c")).as("n_rows"))
  }

  /** Per-key MODE (most frequent value) with a deterministic tie-break
    * (smallest value among the most frequent), two-stage: per-(key, value)
    * counts — the skew-spreading shuffle — then an algebraic `min` over
    * `struct(-count, value)`, whose lexicographic order ranks by count
    * descending, value ascending. Stage 2 is a plain map-side-combinable
    * aggregate: no sorting, no per-key value list. Null values excluded.
    * Output: `keyCols…, mode_value, n_mode`.
    */
  def modePerKey(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "modePerKey requires at least one key column")
    val keys = keyCols.map(col)
    df.filter(col(valueCol).isNotNull)
      .groupBy(keys :+ col(valueCol): _*)
      .agg(count(lit(1)).as("__graft_c"))
      .groupBy(keys: _*)
      .agg(min(struct((-col("__graft_c")).as("nc"), col(valueCol).as("v"))).as("__graft_best"))
      .select(keys ++ Seq(
        col("__graft_best.v").as("mode_value"),
        (-col("__graft_best.nc")).as("n_mode")): _*)
  }
}
