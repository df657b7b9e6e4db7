package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-cliff probe (VERDICT r12 task 5): synthesize a ~10×-bench-scale
  * documents corpus and run the heaviest dedup family heads once, reporting
  * wall time, result cardinality, LSH bucket-cap pressure, and checkpoint
  * storage — the evidence that the bucket caps and CC checkpoints tuned at
  * sf0.1 still hold an order of magnitude up.
  *
  * Corpus synthesis: each replica k offsets ids by k·10⁸ and appends a
  * replica-salt token to `text`. NB this does NOT isolate replicas — one
  * appended token moves 5-gram Jaccard by ~10/215 (J ≈ 0.9 across
  * replicas) and replicas 1..9 sit at edit distance 1 of each other — so
  * every source doc becomes a dense ~10-clique under BOTH similarity
  * metrics, and the probe's pair mass grows ~100× while docs grow 10×.
  * Deliberately kept: denser-than-linear duplication is the stress case
  * for the bucket caps, the prefilter, and the CC loop (a merely-linear
  * corpus would under-test all three). Image bytes are copied verbatim,
  * so image clusters grow 10× too — same stress for the dHash band cap.
  *
  * Usage: runMain graft.ScaleProbe [srcSfDir] [workDir] [replicas]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val work = args.lift(1).getOrElse("/tmp/graft_scaleprobe")
    val replicas = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docsPath = s"$work/documents.parquet"
    // a bare exists() would silently reuse the partial output of a killed
    // prior run (a _temporary dir + a fraction of the part files) and
    // report scale evidence measured on the wrong corpus — require the
    // committed _SUCCESS marker before trusting the dir
    if (!new java.io.File(s"$docsPath/_SUCCESS").exists()) {
      val base = spark.read.parquet(s"$src/documents.parquet")
      // the replica-id offset below is doc_id + rep * 1e8: a source corpus
      // with doc_id >= 1e8 would silently collide replica ids and corrupt
      // the probe corpus — refuse loudly instead
      val maxId = base.agg(max(col("doc_id"))).head().getLong(0)
      require(maxId < 100000000L,
        s"ScaleProbe: source max doc_id $maxId >= 1e8 would collide replica id offsets")
      val rep = spark.range(replicas).select(col("id").as("__rep"))
      base.crossJoin(broadcast(rep))
        .withColumn("doc_id", col("doc_id") + col("__rep") * 100000000L)
        .withColumn("text",
          when(col("__rep") === 0, col("text"))
            .otherwise(concat(col("text"), lit(" repsalt"), col("__rep"))))
        .drop("__rep")
        .repartition(32)
        .write.mode("overwrite").parquet(docsPath)
    }
    val n = spark.read.parquet(docsPath).count()
    println(s"PROBE corpus: $n docs at $work (replicas=$replicas of $src)")

    // LSH bucket-cap pressure at probe scale: the band rows come from the
    // PIPELINE'S OWN shingle/sign/band stages (private[graft]) — the
    // histogram is only evidence if it keys on exactly the buckets the
    // dedup family builds, and a re-implementation would silently diverge
    // the day the band-key formula changes.
    val docs = spark.read.parquet(docsPath)
    val numHashes = 32; val bands = 16
    val buckets = graft.llm.Dedup.bandRows(
        graft.llm.Dedup.signedDocs(
          graft.llm.Dedup.shingleDocs(docs, "doc_id", "text", 5),
          "sh", numHashes),
        numHashes, bands)
      .groupBy(col("band_idx"), col("band_key"))
      .agg(count(lit(1)).as("sz"))
    val capStats = buckets.agg(
      count(lit(1)).as("n_buckets"),
      sum(when(col("sz") > 256, 1L).otherwise(0L)).as("n_over_cap"),
      sum(when(col("sz") > 256, col("sz")).otherwise(0L)).as("rows_over_cap"),
      sum(col("sz")).as("band_rows"),
      max(col("sz")).as("max_bucket")).head()
    println(s"PROBE lsh buckets: total=${capStats.getLong(0)} " +
      s"over_cap=${capStats.getLong(1)} rows_dropped=${capStats.getLong(2)} " +
      s"of ${capStats.getLong(3)} band rows max_bucket=${capStats.getLong(4)}")

    def checkpointBytes(): (Long, Long) = {
      val infos = spark.sparkContext.getRDDStorageInfo
      (infos.map(_.memSize).sum, infos.map(_.diskSize).sum)
    }
    val heads = args.lift(3).map(_.split(",").map(_.trim).toSeq).getOrElse(
      Seq("dedup_minhash", "dedup_apply_priority", "winnow_neardup",
        "dedup_edit", "image_neardup"))
    val nSrcDocs = n / replicas
    heads.foreach { name =>
      val t0 = System.nanoTime()
      // pair-shaped heads materialize so the recall audit below reads the
      // SAME found pairs the timed pass produced (the checkpoint write is
      // inside the timed region — a probe-honesty tradeoff, documented)
      val out = SparkEntry.queries(name)(spark, work)
      val isPairs = out.columns.contains("id_a") && out.columns.contains("id_b")
      val mat = if (isPairs) out.localCheckpoint() else out
      val cnt = mat.count()
      val dt = (System.nanoTime() - t0) / 1e9
      val (mem, disk) = checkpointBytes()
      println(f"PROBE $name%-22s $dt%8.1f s  rows=$cnt%-9d " +
        f"ckpt_mem=${mem / 1048576}%d MiB ckpt_disk=${disk / 1048576}%d MiB")
      if (isPairs && replicas > 1) {
        // Clique recall under cap pressure (VERDICT r14 task 6): every
        // source doc's `replicas` replicas are true near-dups of each
        // other by construction, so the APPLY-level question is whether
        // the found pairs keep each replica family in ONE connected
        // component (transitive closure tolerates individually dropped
        // pairs — the metric a kept/dropped policy actually depends on).
        val cc = graft.operators.ConnectedComponents
          .connectedComponents(mat.select("id_a", "id_b"))
        val per = cc.withColumn("src", col("node") % 100000000L)
          .groupBy("src")
          .agg(countDistinct(col("component")).as("ncl"),
            count(lit(1)).as("nodes"))
        val a = per.agg(
          count(lit(1)).as("src_seen"),
          sum(when(col("ncl") === 1 && col("nodes") === replicas, 1L)
            .otherwise(0L)).as("src_full"),
          sum(when(col("ncl") === 1, 1L).otherwise(0L)).as("src_onecluster"),
          sum(col("nodes")).as("nodes_covered")).head()
        val srcSeen = a.getLong(0); val srcFull = a.getLong(1)
        val srcOne = a.getLong(2); val covered = a.getLong(3)
        // strict = all `replicas` replicas in one component; onecluster
        // tolerates replicas legitimately out of the metric's range (the
        // edit head: replica 0 lacks the salt token, so it sits ~9 edits
        // from the others by CONSTRUCTION — corpus shape, not a miss)
        println(f"PROBE $name%-22s recall: full_clique=$srcFull/$nSrcDocs " +
          f"(${100.0 * srcFull / nSrcDocs}%.2f%%) onecluster=$srcOne/$srcSeen " +
          f"seen src_seen=$srcSeen/$nSrcDocs " +
          f"replica_coverage=$covered/${nSrcDocs * replicas} " +
          f"(${100.0 * covered / (nSrcDocs * replicas)}%.2f%%)")
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
