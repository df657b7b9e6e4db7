package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.skew.PartitionStats._

class PartitionStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("countPerPartition covers every partition, including empty ones") {
    import spark.implicits._
    val ds = (1 to 10).toDS().repartition(6)
    val counts = ds.countPerPartition
    assert(counts.size == 6)
    assert(counts.map(_._2).sum == 10)
    assert(counts.map(_._1).sorted == (0 until 6).toList)
  }

  test("percentile index formula handles n=1 and n=2 (reference U3 edge cases)") {
    import spark.implicits._
    // n=1 partition: all percentiles equal the single count
    val one = (1 to 7).toDS().coalesce(1)
    assert(one.countPerPartition == List((0, 7L)))
    one.showPartitionStats() // must not throw
    val two = (1 to 8).toDS().repartition(2)
    two.showPartitionStats(extended = true) // must not throw
    assert(two.countPerPartition.map(_._2).sum == 8)
  }

  test("partitionSkewRatio flags a skewed layout and is ~1 for round-robin") {
    import spark.implicits._
    val balanced = (1 to 1000).toDS().repartition(8)
    assert(balanced.partitionSkewRatio <= 1.5)
    val skewed = (1 to 1000).map(_ => 1).toDS().repartition(8, $"value")
    assert(skewed.partitionSkewRatio > 4.0)
  }

  test("timedSaveToDisk materializes, reports seconds, and cleans up") {
    import spark.implicits._
    val path = s"/tmp/graft_test_save_${System.nanoTime()}"
    val secs = (1 to 100).toDS().timedSaveToDisk("spec-save", path)
    assert(secs > 0.0)
    assert(!new java.io.File(path).exists())
  }
}
