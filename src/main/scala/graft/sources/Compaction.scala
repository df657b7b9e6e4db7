package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-files compaction planner — the Delta/Iceberg `OPTIMIZE` planning
  * step as a deterministic operator: given a file listing (partition keys,
  * file id, size), roll files into contiguous ~`targetBytes` output groups
  * so a rewrite job knows exactly which inputs each output file takes.
  *
  * '''Bin convention (exact, deterministic).''' Within a partition, files
  * pack in file-id order; file i lands in
  * `bin = (Σ size of files before it) div targetBytes` — the cumulative
  * prefix-sum rule. Every bin's total is < targetBytes + one file (the
  * classic next-fit bound); the FIRST file of a bin is the one that
  * crossed the boundary. Id order (not size-descending first-fit) is
  * deliberate: it keeps the plan a pure window function — no sequential
  * bin state — and preserves any ordering the ingest already gave the
  * files (time locality survives compaction).
  *
  * '''Plan shape (the 100-TB design).''' The input is a FILE listing
  * (metadata-scale: one row per file, millions of rows for a petabyte
  * table, never data rows); one window partitioned by the table's
  * partition keys assigns every bin. Returns the input plus
  * `(bin, bin_total_bytes, n_bin_files)`. */
object Compaction {

  def planBinPack(
      files: DataFrame, partCols: Seq[String],
      fileIdCol: String, sizeCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    // size as the secondary sort key: duplicate file ids within a
    // partition would otherwise make the running sum (and thus every bin)
    // depend on shuffle row order — the determinism contract above
    val w = Window.partitionBy(partCols.map(col): _*)
      .orderBy(col(fileIdCol), col("__sz"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val guarded = when(col(sizeCol) < 0,
      raise_error(concat(lit("planBinPack: negative file size: "),
        col(sizeCol).cast("string"))))
      .otherwise(col(sizeCol)).cast("long")
    val binned = files
      .withColumn("__sz", guarded)
      .withColumn("__before", coalesce(sum(col("__sz")).over(w), lit(0L)))
      .withColumn("bin", expr(s"__before div ${targetBytes}L"))
    val wb = Window.partitionBy((partCols :+ "bin").map(col): _*)
    binned
      .withColumn("bin_total_bytes", sum(col("__sz")).over(wb))
      .withColumn("n_bin_files", count(lit(1)).over(wb))
      .select((partCols.map(col) :+ col(fileIdCol) :+
        col("__sz").as("size_bytes") :+ col("bin") :+
        col("bin_total_bytes") :+ col("n_bin_files")): _*)
  }
}
