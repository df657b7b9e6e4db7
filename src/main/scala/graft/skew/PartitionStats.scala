package graft.skew

import org.apache.commons.io.FileUtils
import org.apache.spark.sql.{Dataset, SaveMode}

/** Partition-diagnostics and timing utilities.
  *
  * Re-expression of the reference's `Utils.scala` implicits
  * (`src/main/scala/org/anish/spark/skew/Utils.scala:18-74`): per-partition
  * record counts, percentile summary (the skew diagnostic used to demonstrate
  * the library's effect), and a timed materializing write.
  */
object PartitionStats {

  implicit class DatasetStats[T](val ds: Dataset[T]) {

    /** Per-partition record counts, `(partitionIndex, count)` — includes
      * empty partitions (reference `Utils.scala:50-54`). One job; lazily
      * cached like the reference's `lazy val`.
      */
    lazy val countPerPartition: List[(Int, Long)] =
      ds.rdd
        .mapPartitionsWithIndex { (idx, it) => Iterator.single((idx, it.size.toLong)) }
        .collect()
        .toList

    /** Prints `idx => count` lines (reference `Utils.scala:23-25`). */
    def showCountPerPartition(): Unit =
      countPerPartition.foreach { case (idx, cnt) => println(s"$idx => $cnt") }

    /** Prints total partitions/records and the min/25th/50th/75th/max
      * percentiles of per-partition counts with the reference's index rule
      * `ceil((n−1)·p/100)` (`Utils.scala:31-43`).
      */
    def showPartitionStats(extended: Boolean = false): Unit = {
      val counts = countPerPartition.map(_._2).sorted
      val n = counts.size
      def pct(p: Int): Long =
        if (n == 0) 0L else counts(math.ceil((n - 1) * p / 100.0).toInt)
      println(s"Total number of partitions: $n")
      println(s"Total records: ${counts.sum}")
      println(
        s"Percentiles (min/25th/50th/75th/max): " +
          s"${pct(0)} / ${pct(25)} / ${pct(50)} / ${pct(75)} / ${pct(100)}")
      if (extended) showCountPerPartition()
    }

    /** Skew ratio max/median of per-partition counts — handy as a regression
      * metric (not in the reference; derived from its U3 diagnostic). */
    def partitionSkewRatio: Double = {
      val counts = countPerPartition.map(_._2).sorted
      if (counts.isEmpty) 0.0
      else {
        val med = counts(math.ceil((counts.size - 1) * 0.5).toInt)
        if (med == 0) counts.last.toDouble else counts.last.toDouble / med
      }
    }

    /** Forces full materialization via a parquet write, prints elapsed time,
      * deletes the output (reference `Utils.scala:57-74` — its only
      * benchmark harness). Returns elapsed seconds.
      */
    def timedSaveToDisk(
        operationName: String,
        tmpFilepath: String = s"/tmp/graft/${System.currentTimeMillis()}"): Double = {
      val t0 = System.nanoTime()
      ds.write.mode(SaveMode.Overwrite).parquet(tmpFilepath)
      val elapsed = (System.nanoTime() - t0) / 1e9
      println(f"Time taken for $operationName: $elapsed%.3f s")
      FileUtils.deleteDirectory(new java.io.File(tmpFilepath))
      elapsed
    }
  }
}
