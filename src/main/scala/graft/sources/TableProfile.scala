package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANALYZE-style one-pass table profiling: per column, the row count,
  * non-null count, exact distinct count, and string-rendered min/max — the
  * statistics a cost-based optimizer (or a data-quality monitor) wants
  * before planning against an unknown table.
  *
  * '''Plan shape (the 100-TB design).''' ONE aggregate job for all
  * columns: Spark plans multi-column `count(DISTINCT ...)` with a single
  * Expand (each input row fans out once per profiled column, tagged by
  * grouping id) feeding partial aggregates — n× the scan volume in one
  * pass, exactly how `ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS`
  * does it, and far cheaper than n separate scans once the table doesn't
  * fit in cache. The wide 1-row result is then unpivoted driver-side
  * (constant-size) into the long (column, stats...) shape.
  *
  * Exact distinct counts — this is the offline-truth profiler; for a
  * streaming/cheap variant swap in [[graft.sketch.KmvOps]] per column.
  * Callers should pre-cast columns whose min/max rendering is
  * engine-sensitive (non-integral doubles); integers, strings, and dates
  * render identically everywhere.
  */
object TableProfile {

  /** (column, n_rows, n_nonnull, n_distinct, min_value, max_value) — one
    * row per profiled column; `n_distinct` counts non-null values; min/max
    * are rendered as strings so heterogeneous columns share one schema. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    val aggs = Seq(count(lit(1)).as("__n")) ++ cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single wide row into per-column rows: a constant-size
    // driver-free reshape (stack over one row)
    val stacked = cols.map { c =>
      struct(lit(c).as("column"), col("__n").as("n_rows"),
        col(s"__nn_$c").as("n_nonnull"), col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"), col(s"__max_$c").as("max_value"))
    }
    wide.select(explode(array(stacked: _*)).as("s"))
      .select("s.column", "s.n_rows", "s.n_nonnull", "s.n_distinct",
        "s.min_value", "s.max_value")
  }
}
