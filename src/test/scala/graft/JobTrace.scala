package graft

import org.apache.spark.sql.SparkSession

/** Job-attribution diagnostic (kept, not throwaway — it earned its place
  * in the r15 job-tax sweep and the triangle-fingerprint bisect): run one
  * query after a warm-up pass and print every Spark job with its stage
  * names, to attribute job-count budgets to pipeline phases.
  * `GRAFT_TRACE_PLAN=1` additionally prints the final adaptive executed
  * plan — the tool that separated "AQE exchange-reuse race" from "join
  * strategy flip" when a fingerprint moves.
  *
  * Usage: `sbt "Test/runMain graft.JobTrace <query> [sfDir]"` */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val (name, dir) = (args(0), args.lift(1).getOrElse("/root/testdata/sf0.01"))
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm
    try SparkEntry.queries(name)(spark, dir).count() catch { case _: Throwable => () }
    val jobs = new java.util.concurrent.CopyOnWriteArrayList[String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val d = Option(js.properties)
          .map(_.getProperty("spark.job.description")).filter(_ != null)
          .getOrElse("")
        val cs = Option(js.properties)
          .map(_.getProperty("callSite.short")).filter(_ != null)
          .getOrElse("")
        val sn = js.stageInfos.map(_.name.takeWhile(_ != '\n')).mkString(" | ")
        jobs.add(f"job ${js.jobId}%3d stages=${js.stageInfos.size}%2d  $cs $d  [${sn.take(180)}]")
      }
    })
    val out = SparkEntry.queries(name)(spark, dir)
    out.count()
    if (sys.env.get("GRAFT_TRACE_PLAN").contains("1"))
      println(out.queryExecution.executedPlan.toString.take(8000))
    Thread.sleep(1500)
    jobs.forEach(s => println(s))
    println(s"TOTAL ${jobs.size} jobs")
    spark.stop()
  }
}
