package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Executor-loss fault probe (r15, VERDICT task 2): the reliable-checkpoint
  * knob on [[graft.operators.ConnectedComponents]] is the 100-TB durability
  * story — "a multi-hour closure survives executor loss and recomputes
  * nothing older than one round" — but until this main no committed run had
  * ever actually LOST an executor. This probe stages the failure for real:
  *
  *  1. `reliable`: run a multi-round CC closure on `local-cluster[2,2,..]`
  *     (separate executor JVMs, a real standalone master/worker pair in
  *     process) with `checkpointDir` set, `kill -9` one executor JVM
  *     mid-closure, and require the job to COMPLETE with the exact same
  *     result checksum as an undisturbed run.
  *  2. `local`: same closure, same kill, with the `localCheckpoint` default
  *     — the checkpoint blocks live only in the dead executor's memory and
  *     lineage is truncated, so the job must FAIL (the documented death
  *     the knob exists to avoid).
  *
  * Both outcomes are required: a reliable run that survives proves the
  * recovery path; a local run that dies proves the probe actually removed
  * state a lazier fault (e.g. killing between rounds) would not touch.
  *
  * Usage: `runMain graft.FaultProbe [reliable|local|both]` (default both).
  * Prints one JSON line; exits nonzero unless every staged outcome holds.
  * Not part of the driver bench — run manually, results recorded in
  * BENCH_NOTES.md. */
object FaultProbe {

  /** Deterministic multi-round workload: 64-node chain components (6+
    * pointer-doubling rounds to converge) plus hub edges for shuffle mass.
    * Entirely from `spark.range` — no fixture dependency, executors need
    * only this repo's classes. */
  private def edges(spark: SparkSession, n: Long): DataFrame = {
    val chain = spark.range(n)
      .filter(col("id") % 64 =!= 63)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    // a few same-component shortcut edges (keeps components identical,
    // adds distinct/dedup work per round)
    val shortcuts = spark.range(n / 8)
      .select((col("id") * 8).as("id_a"),
        ((col("id") * 8) + pmod(hash(col("id")), lit(63)).cast("long") + 1)
          .as("id_b"))
      .filter(col("id_a") % 64 + (col("id_b") - col("id_a")) <= 63)
    chain.unionAll(shortcuts)
  }

  /** Order-independent result fingerprint: (row count, sum of a per-row
    * hash) — collected as two longs, never rows. */
  private def checksum(df: DataFrame): (Long, String) = {
    // decimal sum: 3M+ signed 64-bit hashes overflow a long under ANSI
    val r = df.agg(count(lit(1)),
      sum(xxhash64(col("node"), col("component")).cast("decimal(38,0)"))).head()
    (r.getLong(0), r.getDecimal(1).toBigInteger.toString)
  }

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar")
    .map(p => s"--add-opens $p=ALL-UNNAMED").mkString(" ")

  private def clusterSession(name: String): SparkSession =
    SparkSession.builder()
      .master("local-cluster[2,2,1536]")
      .appName(name)
      // executors are separate JVMs: they need this repo's classes and the
      // same JDK17 module opens the forked driver gets from build.sbt
      .config("spark.executor.extraClassPath",
        System.getProperty("java.class.path"))
      .config("spark.executor.extraJavaOptions", addOpens)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the probe kills executors on purpose; don't let the app give up
      // before the replacement executor registers
      .config("spark.task.maxFailures", "8")
      .config("spark.stage.maxConsecutiveAttempts", "8")
      .getOrCreate()

  /** Parent pid from `/proc/<pid>/stat` field 4 — the comm field (2) can
    * contain spaces/parens, so parse from AFTER the last ')'. */
  private def ppidOf(pid: Long): Option[Long] =
    try {
      val stat = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"/proc/$pid/stat")))
      val rest = stat.substring(stat.lastIndexOf(')') + 1).trim.split("\\s+")
      Some(rest(1).toLong) // fields after comm: state, PPID, ...
    } catch { case _: Throwable => None }

  /** Is `pid` a descendant of THIS JVM? Walks the /proc ppid chain (the
    * executor JVMs are grandchildren via the standalone worker). The
    * `cur == self` test runs BEFORE the pid-1 cutoff: in a container this
    * driver JVM often IS pid 1, and a `cur > 1` loop guard would classify
    * every executor as foreign and leave the probe with no victims. */
  private def isOurDescendant(pid: Long): Boolean = {
    val self = ProcessHandle.current.pid
    var cur = pid
    var hops = 0
    while (cur >= 1 && hops < 32) {
      if (cur == self) return true
      if (cur == 1) return false
      ppidOf(cur) match {
        case Some(p) => cur = p; hops += 1
        case None => return false
      }
    }
    false
  }

  /** `kill -9` one CoarseGrainedExecutorBackend child after `delayMs`,
    * from a daemon thread. Returns the killed PID via the promise. */
  private def scheduleKill(delayMs: Long): java.util.concurrent.CompletableFuture[Long] = {
    val killed = new java.util.concurrent.CompletableFuture[Long]()
    val t = new Thread(() => {
      Thread.sleep(delayMs)
      // /proc scan rather than ProcessHandle.descendants(): the JDK's
      // commandLine() comes back empty for the executor JVMs' multi-KB
      // classpath command lines, which made the handle-based filter blind.
      // Victims are restricted to DESCENDANTS of this JVM (ppid chain): an
      // unrelated Spark app's executors on the same host must never be
      // killed (and would misgrade the staged outcome here).
      val victims = new java.io.File("/proc").listFiles()
        .filter(f => f.getName.forall(_.isDigit))
        .flatMap { f =>
          try {
            val cmd = new String(java.nio.file.Files.readAllBytes(
              java.nio.file.Paths.get(s"/proc/${f.getName}/cmdline")))
            if (cmd.contains("CoarseGrainedExecutorBackend") &&
                isOurDescendant(f.getName.toLong))
              Some(f.getName.toLong)
            else None
          } catch { case _: Throwable => None }
        }
      victims.headOption match {
        case Some(pid) =>
          ProcessHandle.of(pid).ifPresent(_.destroyForcibly())
          System.err.println(s"[faultprobe] killed executor pid $pid " +
            s"(of ${victims.length} executors)")
          killed.complete(pid)
        case None =>
          System.err.println("[faultprobe] no executor process found to kill")
          killed.complete(-1L)
      }
    })
    t.setDaemon(true)
    t.start()
    killed
  }

  /** One staged run. Returns (completed, checksum, killedPid, note). */
  private def stagedRun(reliable: Boolean, n: Long, killAfterMs: Long,
      ckptDir: String): (Boolean, Option[(Long, String)], Long, String) = {
    val spark = clusterSession(s"graft-faultprobe-${if (reliable) "reliable" else "local"}")
    try {
      // make sure both executors are up before the clock starts
      spark.range(1000).repartition(8).count()
      val kill = scheduleKill(killAfterMs)
      // CC construction is EAGER (the closure's rounds run inside it), so
      // it must sit inside the same catch as the final action
      val result =
        try {
          val cc = graft.operators.ConnectedComponents.connectedComponents(
            edges(spark, n), maxIter = 40,
            checkpointDir = if (reliable) Some(ckptDir) else None)
          val c = checksum(cc); (true, Some(c), "completed")
        }
        catch { case e: Throwable =>
          (false, None,
            s"failed: ${Option(e.getMessage).getOrElse(e.getClass.getName).linesIterator.take(1).mkString.take(200)}")
        }
      val pid = kill.get(60, java.util.concurrent.TimeUnit.SECONDS)
      (result._1, result._2, pid, result._3)
    } finally spark.stop()
  }

  // ———————————————————— streaming mode (r16, task 3) ————————————————————
  // The batch probe above proves the CC closure's reliable-checkpoint story;
  // this stages the STREAMING one: a flatMapGroupsWithState fold (the
  // richest per-group state on the surface — latenessUpdates' 9-counter
  // tuple) running on local-cluster with task.maxFailures=1, an executor
  // kill -9 mid-micro-batch killing the QUERY, then a fresh query started
  // from the same HDFSBackedStateStore checkpoint — whose converged state
  // must equal an undisturbed run byte-for-byte. The sink is a foreachBatch
  // parquet write keyed by batchId with overwrite, so the recovery re-run
  // of the uncommitted batch is idempotent.

  /** 20 mtime-staggered slice files of (g, arr, ts): arrival-ordered ids,
    * event times jittered ±100 min against arrival — the fold counts the
    * disorder; 8 groups × `n`/8 rows of state updates. */
  private def writeSlicedStream(spark: SparkSession, dir: String, n: Int,
      slices: Int): Unit = {
    val rnd = new scala.util.Random(7)
    val rows = (1 to n).map { i =>
      org.apache.spark.sql.Row(s"g${i % 8}", i.toLong,
        i.toLong * 12000000000L + (rnd.nextInt(41) - 20) * 30000000000L)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("g",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("arr",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.LongType, nullable = false)))
    new java.io.File(dir).mkdirs()
    FuzzCorpus.writeSliceFiles(spark, new java.io.File(dir), schema,
      rows.grouped(math.max(n / slices, 1)).map(_.toSeq).toSeq)
  }

  /** Start the lateness fold over the sliced source, one file per trigger,
    * checkpointed at `ckpt`, each batch's update rows parquet'd to
    * `sink/batch_<id>` (overwrite = recovery-idempotent). Returns when the
    * source is drained or the query dies; (completed, note). */
  private def runLatenessQuery(spark: SparkSession, srcDir: String,
      ckpt: String, sink: String, batchSleepMs: Long = 0L): (Boolean, String) = {
    val stream = spark.readStream
      .schema("g STRING, arr BIGINT, ts BIGINT")
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    val q = graft.streaming.StreamOps.latenessUpdates(stream, "g", "arr", "ts")
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        df.write.mode("overwrite").parquet(s"$sink/batch_$id")
        // driver-kill staging: widen the mid-stream window so the parent's
        // SIGKILL reliably lands between batch commits, not after drain
        if (batchSleepMs > 0) Thread.sleep(batchSleepMs)
      }
      .start()
    try { q.processAllAvailable(); (true, "drained") }
    catch { case e: Throwable =>
      (false, Option(e.getMessage).getOrElse(e.getClass.getName)
        .linesIterator.take(1).mkString.take(200))
    }
    finally { try q.stop() catch { case _: Throwable => () } }
  }

  /** Converged per-group state from the batch-keyed sink: max-update_seq
    * row per group, rendered as one sorted string. */
  private def convergedState(spark: SparkSession, sink: String): String = {
    val all = spark.read.parquet(s"$sink/batch_*")
    val rest = all.columns.filterNot(Set("g", "update_seq")).map(col)
    all.groupBy("g").agg(max(struct(col("update_seq") +: rest: _*)).as("f"))
      .select(col("g"), col("f.*"))
      .collect()
      .map(_.toString)
      .sorted
      .mkString("|")
  }

  private def streamingProbe(base: String, killAfterMs: Long): Boolean = {
    val src = s"$base/stream_src"
    // clean truth on a plain local session
    val clean = {
      val spark = SparkSession.builder().master("local[4]")
        .appName("graft-faultprobe-stream-clean")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      try {
        writeSlicedStream(spark, src, 40000, 20)
        val (ok, note) = runLatenessQuery(spark, src, s"$base/ckpt_clean", s"$base/sink_clean")
        require(ok, s"clean streaming run failed: $note")
        convergedState(spark, s"$base/sink_clean")
      } finally spark.stop()
    }
    System.err.println(s"[faultprobe] stream clean state: ${clean.take(120)}...")

    // disturbed run: local-cluster, NO task retries — the kill must fail
    // the query mid-batch; then a fresh query resumes from the checkpoint
    val spark = SparkSession.builder()
      .master("local-cluster[2,2,1536]")
      .appName("graft-faultprobe-streaming")
      .config("spark.executor.extraClassPath", System.getProperty("java.class.path"))
      .config("spark.executor.extraJavaOptions", addOpens)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.task.maxFailures", "1")
      .getOrCreate()
    try {
      spark.range(1000).repartition(8).count() // both executors up
      val kill = scheduleKill(killAfterMs)
      val (completedFirst, note1) =
        runLatenessQuery(spark, src, s"$base/ckpt_kill", s"$base/sink_kill")
      val pid = kill.get(60, java.util.concurrent.TimeUnit.SECONDS)
      System.err.println(
        s"[faultprobe] stream first leg: completed=$completedFirst pid=$pid note=$note1")
      // the staged outcome: the kill landed AND the query died mid-stream
      if (pid <= 0 || completedFirst) {
        System.err.println("[faultprobe] stream: kill missed the query window — stage again")
        return false
      }
      // restart from the SAME checkpoint: must drain and converge to clean
      val (completedResume, note2) =
        runLatenessQuery(spark, src, s"$base/ckpt_kill", s"$base/sink_kill")
      System.err.println(s"[faultprobe] stream resume: completed=$completedResume note=$note2")
      if (!completedResume) return false
      val resumed = convergedState(spark, s"$base/sink_kill")
      val matches = resumed == clean
      System.err.println(s"[faultprobe] stream resume matches clean: $matches")
      matches
    } finally spark.stop()
  }

  // ———————————————————— driver-kill mode (r17, task 7) ————————————————————
  // The executor-kill legs above lose a WORKER; the recovery production
  // users actually exercise is whole-application restart: the driver JVM
  // dies mid-stream (deploy, OOM-kill, preemption) and a fresh submission
  // resumes from the same checkpoint. This stages it for real: a CHILD JVM
  // runs the lateness fold, the parent SIGKILLs the child after a few
  // batches have committed (it polls the sink for batch_N — no timing
  // race), a SECOND child restarts the query from the same checkpoint, and
  // the converged per-group state must equal an undisturbed run exactly.
  // The foreachBatch sink overwrites by batchId, so the recovery re-run of
  // the batch that died uncommitted is idempotent — the exactly-once story
  // under driver loss, not just executor loss.

  /** Marker the child writes ONLY after its query fully drained — its
    * absence after the kill proves the first leg really died mid-stream. */
  private def drainedMarker(sink: String) = new java.io.File(s"$sink/__drained")

  /** Child-JVM entry (`driver-child <src> <ckpt> <sink> <batchSleepMs>`):
    * plain local[4] session, the lateness fold, then the drained marker. */
  private def driverChild(src: String, ckpt: String, sink: String,
      sleepMs: Long): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .appName("graft-faultprobe-driver-child")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val (ok, note) = runLatenessQuery(spark, src, ckpt, sink, sleepMs)
      require(ok, s"driver-child query failed: $note")
      java.nio.file.Files.writeString(drainedMarker(sink).toPath, "drained\n")
    } finally spark.stop()
  }

  private def spawnChild(src: String, ckpt: String, sink: String,
      sleepMs: Long): Process = {
    val java = s"${System.getProperty("java.home")}/bin/java"
    val cmd = Seq(java) ++ addOpens.split(" ").toSeq ++ Seq(
      "-Xmx2g", "-cp", System.getProperty("java.class.path"),
      "graft.FaultProbe", "driver-child", src, ckpt, sink, sleepMs.toString)
    new ProcessBuilder(cmd: _*).redirectErrorStream(true)
      .redirectOutput(ProcessBuilder.Redirect.DISCARD).start()
  }

  private def driverProbe(base: String): Boolean = {
    val src = s"$base/stream_src"
    val spark = SparkSession.builder().master("local[4]")
      .appName("graft-faultprobe-driver-orchestrator")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      writeSlicedStream(spark, src, 40000, 20)
      val (ok, note) = runLatenessQuery(spark, src, s"$base/ckpt_clean",
        s"$base/sink_clean")
      require(ok, s"clean streaming run failed: $note")
      val clean = convergedState(spark, s"$base/sink_clean")
      System.err.println(s"[faultprobe] driver clean state: ${clean.take(120)}...")

      val sink = s"$base/sink_kill"
      val ckpt = s"$base/ckpt_kill"
      // leg 1: child runs slowed (600 ms/batch over 20 batches); kill the
      // DRIVER JVM once batch_4 is committed — deterministically mid-stream
      val child1 = spawnChild(src, ckpt, sink, sleepMs = 600)
      val deadline = System.currentTimeMillis() + 180000
      var staged = false
      while (!staged && System.currentTimeMillis() < deadline &&
          child1.isAlive) {
        if (new java.io.File(s"$sink/batch_4").exists()) staged = true
        else Thread.sleep(200)
      }
      if (!staged) {
        System.err.println("[faultprobe] driver: child drained or timed out " +
          "before batch_4 — stage again")
        child1.destroyForcibly(); child1.waitFor()
        return false
      }
      child1.destroyForcibly() // SIGKILL: no shutdown hooks, no commit
      child1.waitFor()
      val diedMidStream = !drainedMarker(sink).exists()
      System.err.println(s"[faultprobe] driver: child killed " +
        s"(exit=${child1.exitValue()}), died mid-stream=$diedMidStream")
      if (!diedMidStream) return false

      // leg 2: whole-app restart — a FRESH JVM resumes from the checkpoint
      val child2 = spawnChild(src, ckpt, sink, sleepMs = 0)
      val finished = child2.waitFor(180, java.util.concurrent.TimeUnit.SECONDS)
      if (!finished || child2.exitValue() != 0 || !drainedMarker(sink).exists()) {
        System.err.println(s"[faultprobe] driver: restart leg failed " +
          s"(finished=$finished exit=${if (finished) child2.exitValue() else -1})")
        if (!finished) { child2.destroyForcibly(); child2.waitFor() }
        return false
      }
      val resumed = convergedState(spark, sink)
      val matches = resumed == clean
      System.err.println(s"[faultprobe] driver resume matches clean: $matches")
      matches
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("both")

    if (mode == "driver-child") {
      driverChild(args(1), args(2), args(3), args(4).toLong)
      return
    }

    if (mode == "driver") {
      val base = s"${System.getProperty("java.io.tmpdir")}/graft_faultprobe_driver_${ProcessHandle.current.pid}"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
      var ok = false
      var attempt = 0
      while (!ok && attempt < 3) {
        attempt += 1
        try ok = driverProbe(s"$base/attempt_$attempt")
        catch { case e: Throwable =>
          System.err.println(s"[faultprobe] driver attempt $attempt error: ${e.getMessage}")
        }
      }
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
      println(s"""{"probe":"streaming_driver_kill","attempts":$attempt,"ok":$ok}""")
      if (!ok) sys.exit(1)
      return
    }
    val n = sys.env.getOrElse("GRAFT_FAULT_N", "3000000").toLong
    val killAfterMs = sys.env.getOrElse("GRAFT_FAULT_KILL_MS", "12000").toLong
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_faultprobe_${ProcessHandle.current.pid}"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))

    if (mode == "streaming") {
      // kill timing is inherently racy (the query must be mid-batch when
      // the executor dies) — stage up to 3 attempts, each on a fresh base
      val killMs = sys.env.getOrElse("GRAFT_FAULT_STREAM_KILL_MS", "8000").toLong
      var ok = false
      var attempt = 0
      while (!ok && attempt < 3) {
        attempt += 1
        val b = s"$base/stream_$attempt"
        try ok = streamingProbe(b, killMs)
        catch { case e: Throwable =>
          System.err.println(s"[faultprobe] streaming attempt $attempt error: ${e.getMessage}")
        }
      }
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
      println(s"""{"probe":"streaming_executor_kill","attempts":$attempt,"kill_after_ms":$killMs,"ok":$ok}""")
      if (!ok) sys.exit(1)
      return
    }

    // undisturbed truth: plain local[4] run, no kills, for the checksum
    val clean = {
      val spark = SparkSession.builder().master("local[4]")
        .appName("graft-faultprobe-clean")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      try checksum(graft.operators.ConnectedComponents.connectedComponents(
        edges(spark, n), maxIter = 40))
      finally spark.stop()
    }
    System.err.println(s"[faultprobe] clean checksum: $clean")

    var reliableOk = true; var localOk = true
    var reliableJson = "null"; var localJson = "null"
    def j(completed: Boolean, cs: Option[(Long, String)], pid: Long,
        note: String, matches: Option[Boolean]) =
      s"""{"completed": $completed, "killed_pid": $pid, "matches_clean": ${matches.map(_.toString).getOrElse("null")}, "note": ${Verify.q(note)}}"""

    if (mode == "reliable" || mode == "both") {
      val (done, cs, pid, note) =
        stagedRun(reliable = true, n, killAfterMs, s"$base/ckpt")
      val matches = cs.map(_ == clean)
      reliableOk = done && pid > 0 && matches.contains(true)
      reliableJson = j(done, cs, pid, note, matches)
      System.err.println(s"[faultprobe] reliable: $reliableJson")
    }
    if (mode == "local" || mode == "both") {
      val (done, cs, pid, note) =
        stagedRun(reliable = false, n, killAfterMs, s"$base/unused")
      // the DOCUMENTED death: local checkpoint blocks died with the
      // executor, the closure must not complete
      localOk = !done && pid > 0
      localJson = j(done, cs, pid, note, cs.map(_ == clean))
      System.err.println(s"[faultprobe] local: $localJson")
    }

    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    val ok = reliableOk && localOk
    println(s"""{"probe":"executor_kill","n_edges_base":$n,"kill_after_ms":$killAfterMs,"clean_checksum":[${clean._1},"${clean._2}"],"reliable":$reliableJson,"local_checkpoint":$localJson,"ok":$ok}""")
    if (!ok) sys.exit(1)
  }
}
