package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Funnel

class FunnelSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("funnel counts ordered completions only, earliest-completion semantics") {
    import spark.implicits._
    val ev = Seq(
      // u1 completes A→B→C in order
      (1L, "A", 10L), (1L, "B", 20L), (1L, "C", 30L),
      // u2 does B before A: reaches A, needs a B AFTER t=15 — has one at 40
      (2L, "B", 5L), (2L, "A", 15L), (2L, "B", 40L),
      // u3 out of order: C then B then A — reaches only step A
      (3L, "C", 1L), (3L, "B", 2L), (3L, "A", 3L),
      // u4 never does A
      (4L, "B", 1L), (4L, "C", 2L),
      // u5: A and B at the SAME timestamp — strictly-after excludes it
      (5L, "A", 7L), (5L, "B", 7L)
    ).toDF("user_id", "event_type", "ts")
    val got = Funnel.funnel(ev, "user_id", "event_type", "ts", Seq("A", "B", "C"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((0L, "A", 4L), (1L, "B", 2L), (2L, "C", 1L)), s"got $got")
  }

  test("a NULL user with a full journey is one funnel user, not dropped") {
    import spark.implicits._
    // the stage joins are null-safe (<=>): groupBy made NULL a group at
    // stage 0, so later stages must carry it — and the DuckDB oracle joins
    // with IS NOT DISTINCT FROM to match (SparkEntry events_funnel)
    val ev = Seq(
      (Some(1L), "A", 10L), (Some(1L), "B", 20L),
      (None, "A", 5L), (None, "B", 6L), (None, "C", 7L)
    ).toDF("user_id", "event_type", "ts")
    val got = Funnel.funnel(ev, "user_id", "event_type", "ts", Seq("A", "B", "C"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(got == Seq((0L, 2L), (1L, 2L), (2L, 1L)), s"got $got")
  }

  test("one deferred job scans the events source once per step, not O(steps²)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = java.nio.file.Files.createTempDirectory("graft_funnel_scans")
    try {
      (for (u <- 1L to 50L; (t, i) <- Seq("A", "B", "C", "D").zipWithIndex)
        yield (u, t, u * 100 + i)).toDF("user_id", "event_type", "ts")
        .write.parquet(s"$dir/events")
      val ev = spark.read.parquet(s"$dir/events")
      val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val steps = Seq("A", "B", "C", "D")
        val q = Funnel.funnel(ev, "user_id", "event_type", "ts", steps)
        val got = q.collect().map(r => (r.getString(1), r.getLong(2))).toMap
        assert(got == Map("A" -> 50L, "B" -> 50L, "C" -> 50L, "D" -> 50L))
        // stage k's per-user frame is shared between its own count branch
        // and stage k+1's join via ReusedExchange, so the executed plan
        // carries exactly one (filter-pushed) events scan per step — the
        // naive per-stage-action formulation re-scans stages 0..k-1 for
        // every k (10 scans here for 4 steps)
        val scans = q.queryExecution.executedPlan.collect {
          case s: FileSourceScanExec => s
        }
        assert(scans.nonEmpty, "no FileSourceScanExec in the executed plan")
        assert(scans.size <= steps.size + 1,
          s"expected ≤ ${steps.size + 1} events scans, found ${scans.size}:\n" +
            scans.map(s => s.metadata.getOrElse("PushedFilters", "?")).mkString("\n") +
            "\n" + q.queryExecution.executedPlan.treeString)
      } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("funnel result is one deferred frame — no jobs run at construction time") {
    import spark.implicits._
    val ev = Seq((1L, "A", 10L), (1L, "B", 20L)).toDF("user_id", "event_type", "ts")
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val q = Funnel.funnel(ev, "user_id", "event_type", "ts", Seq("A", "B"))
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after == before,
      s"funnel construction launched ${after - before} job(s); must be deferred")
    assert(q.collect().map(_.getLong(2)).toSeq == Seq(1L, 1L))
  }

  test("earliest-completion: a later step-1 event cannot resurrect the funnel") {
    import spark.implicits._
    // u1's EARLIEST A is at 10; B exists only before it and C after — the
    // B at 5 does not count even though (A@1 missing) ... funnel uses the
    // earliest A then requires B strictly after 10
    val ev = Seq(
      (1L, "A", 10L), (1L, "B", 5L), (1L, "C", 30L),
      (1L, "A", 50L) // later A must not re-anchor the funnel
    ).toDF("user_id", "event_type", "ts")
    val got = Funnel.funnel(ev, "user_id", "event_type", "ts", Seq("A", "B", "C"))
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    assert(got == Map("A" -> 1L, "B" -> 0L, "C" -> 0L), s"got $got")
  }

  test("timedFunnel: later steps must land within the window of the FIRST step-1") {
    import spark.implicits._
    val ev = Seq(
      // u1 completes fully inside the window anchored at ts=10
      (1L, "A", 10L), (1L, "B", 20L), (1L, "C", 30L),
      // u2's B is beyond t0+W — even though a LATER A (t=40) would admit
      // it, the anchor is the first A (documented convention)
      (2L, "A", 0L), (2L, "A", 40L), (2L, "B", 50L),
      // u3's B lands exactly at t0+W (inclusive bound), C one past it
      (3L, "A", 0L), (3L, "B", 30L), (3L, "C", 31L)
    ).toDF("user_id", "event_type", "ts")
    val got = Funnel.timedFunnel(
      ev, "user_id", "event_type", "ts", Seq("A", "B", "C"), windowNs = 30L)
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    assert(got == Map("A" -> 3L, "B" -> 2L, "C" -> 1L), s"got $got")
  }

  test("timedFunnel keeps the one-scan-per-step ReusedExchange discipline") {
    import spark.implicits._
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = java.nio.file.Files.createTempDirectory("graft_tfunnel_scans")
    try {
      (for (u <- 1L to 50L; (t, i) <- Seq("A", "B", "C", "D").zipWithIndex)
        yield (u, t, u * 100 + i)).toDF("user_id", "event_type", "ts")
        .write.parquet(s"$dir/events")
      val ev = spark.read.parquet(s"$dir/events")
      val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val steps = Seq("A", "B", "C", "D")
        val q = Funnel.timedFunnel(ev, "user_id", "event_type", "ts", steps,
          windowNs = 1000L)
        val got = q.collect().map(r => (r.getString(1), r.getLong(2))).toMap
        assert(got == Map("A" -> 50L, "B" -> 50L, "C" -> 50L, "D" -> 50L))
        // the count expression must reference BOTH __t and __t0, else
        // pruning forks the stage aggregate and every stage re-scans its
        // predecessors (the O(steps²) this construction exists to avoid)
        val scans = q.queryExecution.executedPlan.collect {
          case s: FileSourceScanExec => s
        }
        assert(scans.nonEmpty, "no FileSourceScanExec in the executed plan")
        assert(scans.size <= steps.size + 1,
          s"expected ≤ ${steps.size + 1} events scans, found ${scans.size}:\n" +
            q.queryExecution.executedPlan.treeString)
      } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("timedFunnel with a huge window degenerates to the plain funnel") {
    import spark.implicits._
    val ev = Seq(
      (1L, "A", 10L), (1L, "B", 20L), (1L, "C", 30L),
      (2L, "B", 5L), (2L, "A", 15L), (2L, "B", 40L),
      (3L, "C", 1L), (3L, "B", 2L), (3L, "A", 3L),
      (5L, "A", 7L), (5L, "B", 7L)
    ).toDF("user_id", "event_type", "ts")
    val plain = Funnel.funnel(ev, "user_id", "event_type", "ts", Seq("A", "B", "C"))
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    val timed = Funnel.timedFunnel(
      ev, "user_id", "event_type", "ts", Seq("A", "B", "C"), Long.MaxValue / 4)
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    assert(timed == plain, s"timed $timed vs plain $plain")
  }
}
