package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph + streaming scale probe (r15, VERDICT task 3): the dedup heads
  * have recall-audited 100× evidence (ScaleProbe); this main extends the
  * same discipline to the two families whose 100-TB story was so far
  * plan-read only —
  *
  *  - '''graph''': a synthetic edge set with 1024-node chain components
  *    (the worst case for pointer-doubling round counts: ~log₂(1024)
  *    star rounds) plus hub-skew mass, at ~100× the bench graph's edge
  *    count. Reports CC wall/rounds/result, PageRank wall at fixed
  *    iterations, and triangle wall — with per-phase Spark job counts
  *    (the round count IS the job count in the AQE-off round design).
  *  - '''streaming''': an event stream with ~100× the bench key count.
  *    Reports per-operator STATE SIZE (rows + bytes from
  *    `StreamingQueryProgress.stateOperators`) for the lateness fold
  *    keyed at user grain and the stream-stream interval join — the two
  *    stateful shapes whose per-key state must stay bounded for the
  *    watermark to be the only growth axis.
  *
  * Usage: runMain graft.ScaleProbeGS [workDir] [edgeScale] [eventRows]
  * Prints PROBE lines; results recorded in BENCH_NOTES.md. */
object ScaleProbeGS {

  private def jobsRun(spark: SparkSession, counter: java.util.concurrent.atomic.AtomicInteger)(f: => Long): (Long, Double, Int) = {
    counter.set(0)
    val t0 = System.nanoTime()
    val out = f
    val dt = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // listener bus drain
    (out, dt, counter.get())
  }

  def main(args: Array[String]): Unit = {
    val work = args.lift(0).getOrElse("/tmp/graft_scaleprobe_gs")
    val edgeScale = args.lift(1).map(_.toLong).getOrElse(8000000L)
    val eventRows = args.lift(2).map(_.toLong).getOrElse(4000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobCount = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobCount.incrementAndGet()
    })

    // ————————————————————— graph leg —————————————————————
    // chain edges (i, i+1) within 1024-node blocks: component diameter
    // 1023, the pointer-doubling stress; plus 5% hub edges into 16 hubs
    // per 2^20-node region (hot-key mass for the star rounds' shuffle)
    val chain = spark.range(edgeScale)
      .filter(col("id") % 1024 =!= 1023)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    val hubs = spark.range(edgeScale / 20)
      .select((col("id") * 20).as("id_a"),
        (col("id") * 20 - pmod(col("id") * 20, lit(1048576L)) +
          pmod(xxhash64(col("id")), lit(16L))).as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
    // (i, i+2) shortcuts on the first 100 nodes of each chain close
    // (i, i+1, i+2) triangles — the triangle leg needs actual triangles
    val closers = spark.range(edgeScale)
      .filter(col("id") % 1024 < 100)
      .select(col("id").as("id_a"), (col("id") + 2).as("id_b"))
    val edges = chain.unionAll(hubs).unionAll(closers)
    val nEdges = edges.count()
    println(s"PROBE graph: $nEdges edges, 1024-node chains + 16-hub regions")

    val (nNodes, ccDt, ccJobs) = jobsRun(spark, jobCount) {
      graft.operators.ConnectedComponents
        .connectedComponents(edges, maxIter = 30).count()
    }
    // AQE-off round design: one job per star round after the init — the
    // job count is (init jobs + rounds + final count), so rounds ≈ jobs-3
    println(f"PROBE cc          $ccDt%8.1f s  nodes=$nNodes%-10d jobs=$ccJobs (≈rounds+3; diameter 1023)")
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))

    val (prRows, prDt, prJobs) = jobsRun(spark, jobCount) {
      graft.operators.PageRank.pageRankInt(edges, "id_a", "id_b", iters = 4)
        .count()
    }
    println(f"PROBE pagerank    $prDt%8.1f s  rows=$prRows%-10d jobs=$prJobs (4 fixed iterations)")
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))

    // triangles on a denser slice (wedge mass explodes quadratically in
    // hub degree; the degree-ordered join bounds it at O(m^1.5))
    val triEdges = edges.filter(col("id_a") < 2000000L && col("id_b") < 2000000L)
    val (nTri, triDt, triJobs) = jobsRun(spark, jobCount) {
      val t = graft.operators.Triangles.triangleCount(triEdges, "id_a", "id_b")
      t.agg(coalesce(sum("n_triangles"), lit(0L))).head().getLong(0)
    }
    println(f"PROBE triangles   $triDt%8.1f s  tri=$nTri%-10d jobs=$triJobs (2M-node slice)")
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))

    // ————————————————————— streaming leg —————————————————————
    val nUsers = 400000L // ~100× the sf0.1 key grain
    val evPath = s"$work/events.parquet"
    if (!new java.io.File(s"$evPath/_SUCCESS").exists()) {
      spark.range(eventRows).select(
        col("id").as("event_id"),
        // 30-day span, deterministic scatter; NTZ like the fixture
        expr("cast(timestamp_micros(1704067200000000 + " +
          "pmod(xxhash64(id, 7), 2592000) * 1000000 + pmod(id, 1000000)) " +
          "as timestamp_ntz)").as("ts"),
        // 10% of traffic on 40 hot users, rest uniform over 400k
        when(pmod(xxhash64(col("id"), lit(11L)), lit(10L)) === 0,
          pmod(xxhash64(col("id"), lit(13L)), lit(40L)))
          .otherwise(pmod(xxhash64(col("id"), lit(17L)), lit(nUsers)))
          .as("user_id"),
        element_at(array(lit("view"), lit("click"), lit("purchase"),
          lit("signup"), lit("error")),
          (pmod(xxhash64(col("id"), lit(19L)), lit(5L)) + 1).cast("int"))
          .as("event_type"),
        (pmod(xxhash64(col("id"), lit(23L)), lit(100000L)) / 100.0).as("value"),
        lit("""{"k": 1}""").as("props"))
        .repartition(32)
        .write.mode("overwrite").parquet(evPath)
    }
    println(s"PROBE stream corpus: $eventRows rows, $nUsers distinct keys at $evPath")

    def stateOf(df: DataFrame, name: String, mode: String): Unit = {
      val t0 = System.nanoTime()
      val q = df.writeStream.outputMode(mode).format("memory")
        .queryName(name).start()
      try q.processAllAvailable() finally q.stop()
      val dt = (System.nanoTime() - t0) / 1e9
      val ops = q.recentProgress.flatMap(p => Option(p.stateOperators))
        .lastOption.map(_.toSeq).getOrElse(Seq.empty)
      val rows = ops.map(_.numRowsTotal).sum
      val mem = ops.map(_.memoryUsedBytes).sum
      val outRows = spark.table(name).count()
      println(f"PROBE $name%-18s $dt%8.1f s  state_rows=$rows%-9d " +
        f"state_mem=${mem / 1048576}%d MiB out_rows=$outRows")
      org.apache.spark.sql.graftshim.Bridge.unloadStateStores()
    }

    import graft.streaming.StreamOps
    // lateness fold at USER grain: 400k state entries of a fixed-width
    // counter tuple — state must scale with keys, never with rows
    stateOf(
      StreamOps.latenessUpdates(
        StreamOps.eventsStream(spark, evPath), "user_id", "event_id", "ts_ns"),
      "probe_lateness", "update")

    // stream-stream interval join: state is the watermark-bounded buffer
    // of both sides; the skew-salted form must hold the same bound with
    // 10% of traffic on 40 hot keys
    val ev = StreamOps.eventsStream(spark, evPath)
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_event_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("c_event_id"), col("ts"))
    stateOf(
      StreamOps.skewedIntervalJoin(purch, clicks, Seq("user_id"),
        "0 SECOND", "1 HOUR",
        hotKeySource = spark.read.parquet(evPath).select("user_id")),
      "probe_intervaljoin", "append")

    spark.stop()
  }
}
