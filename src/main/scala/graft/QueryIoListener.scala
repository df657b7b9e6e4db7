package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}

/** Per-query Spark accounting for [[Bench]] — plan fingerprints and IO
  * bytes, keyed by the `graftbench:<query>#<iter>` job group.
  *
  * Jobs/stages (VERDICT r13 task 3) fingerprint plan SHAPE: wall time on
  * the driver host is noisy (documented 3-4× family drift with zero code
  * change), but job and stage counts are deterministic plan properties —
  * a wall-time move with unchanged counts is environment, a moved count
  * is a plan change.
  *
  * Shuffle/spill BYTES (VERDICT r14 task 6, made exact r17 task 4) are
  * accumulated at TASK grain (`onTaskEnd`), attributed to the owning
  * query through a stageId → job-group map built at job start. Task-level
  * sums are EXACT under every attempt structure: a partial stage retry
  * adds exactly the re-run tasks' bytes, a full re-run adds both
  * attempts' (bytes actually moved — the 100-TB cost being measured).
  * The r16 design aggregated per STAGE with last-attempt-wins, which
  * undercounted partial retries (only attempt-2 task metrics survived);
  * that approximation is gone. Stages skipped via exchange reuse run no
  * tasks, so reused shuffles still count once — same property as before.
  */
final class QueryIoListener extends SparkListener {

  /** job group → (jobs, stages) — the plan fingerprint. */
  val planCounts = new ConcurrentHashMap[String, (Int, Int)]()

  private val stageGroup = new ConcurrentHashMap[Integer, String]()
  private val groupIo = new ConcurrentHashMap[String, (Long, Long, Long)]()

  /** Test seam: pre-register a stage→group mapping so a spec can replay
    * synthesized task-end sequences (retry shapes are hard to force
    * deterministically on a healthy local cluster). */
  private[graft] def registerStage(stageId: Int, group: String): Unit =
    stageGroup.put(stageId, group)

  override def onJobStart(js: SparkListenerJobStart): Unit = {
    val g = Option(js.properties).map(_.getProperty("spark.jobGroup.id")).orNull
    if (g != null && g.startsWith("graftbench:")) {
      planCounts.merge(g, (1, js.stageInfos.size),
        (a, b) => (a._1 + b._1, a._2 + b._2))
      js.stageInfos.foreach(si => stageGroup.put(si.stageId, g))
    }
  }

  override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
    val g = stageGroup.get(te.stageId)
    val tm = te.taskMetrics
    if (g != null && tm != null)
      groupIo.merge(g,
        (tm.shuffleReadMetrics.totalBytesRead,
          tm.shuffleWriteMetrics.bytesWritten,
          tm.memoryBytesSpilled + tm.diskBytesSpilled),
        (a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3))
  }

  /** (shuffle_read, shuffle_write, spill) bytes for one job group. */
  def ioForGroup(g: String): (Long, Long, Long) =
    groupIo.getOrDefault(g, (0L, 0L, 0L))
}
