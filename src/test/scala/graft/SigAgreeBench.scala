package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Microbenchmark: HOF agreement count vs SigAgree over N pair rows. */
object SigAgreeBench {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(2000000)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = spark.range(n.toLong).select(col("id"),
      transform(sequence(lit(0), lit(31)), i => pmod(col("id") + i, lit(7)).cast("long")).as("a"),
      transform(sequence(lit(0), lit(31)), i => pmod(col("id") * 3 + i, lit(7)).cast("long")).as("b"))
      .localCheckpoint()
    def time(label: String)(f: => Long): Unit = {
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime()
        val r = f
        println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$r)")
      }
    }
    time("hof    ")(df.filter(
      size(filter(zip_with(col("a"), col("b"), (x, y) => x === y), p => p)) >= 4).count())
    time("sigagree")(df.filter(
      graft.functions.SigAgree.sigAgree(col("a"), col("b")) >= 4).count())
    spark.stop()
  }
}
