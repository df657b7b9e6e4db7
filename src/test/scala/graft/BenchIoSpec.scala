package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.graftshim.Bridge

/** Bench's per-query byte attribution must be EXACT under stage retries
  * (r17, VERDICT task 4). The r16 accounting aggregated per stage with
  * last-attempt-wins, which undercounted PARTIAL retries (a stage whose
  * attempt 2 re-runs only the missing tasks reported only those tasks'
  * bytes); [[QueryIoListener]] sums at task grain instead, which is exact
  * regardless of attempt structure. Retries can't be forced
  * deterministically on a healthy local cluster, so the spec replays the
  * listener-event sequences a retry produces (via the shim — TaskMetrics
  * mutators are private[spark]). */
class BenchIoSpec extends AnyFunSuite {

  private val G = "graftbench:q#1"

  test("partial stage retry: attempt-2 tasks ADD to attempt-1's — no undercount") {
    val lis = new QueryIoListener
    lis.registerStage(7, G)
    // attempt 0: 4 of 6 tasks complete with metrics (100r/10w each); the
    // other 2 die to a fetch failure before reporting
    (1 to 4).foreach(_ => lis.onTaskEnd(Bridge.taskEndEvent(7, 0, 100, 10, 0)))
    // attempt 1 (partial): exactly the 2 missing tasks re-run
    (1 to 2).foreach(_ => lis.onTaskEnd(Bridge.taskEndEvent(7, 1, 100, 10, 0)))
    // exact: 6 tasks' bytes. The r16 last-attempt-wins stage accounting
    // reported only attempt 1's aggregate here — (200, 20, 0), biased LOW.
    assert(lis.ioForGroup(G) == ((600L, 60L, 0L)))
  }

  test("full stage re-run counts both attempts: bytes actually moved") {
    val lis = new QueryIoListener
    lis.registerStage(3, G)
    (1 to 3).foreach(_ => lis.onTaskEnd(Bridge.taskEndEvent(3, 0, 50, 5, 1)))
    (1 to 3).foreach(_ => lis.onTaskEnd(Bridge.taskEndEvent(3, 1, 50, 5, 1)))
    assert(lis.ioForGroup(G) == ((300L, 30L, 6L)))
  }

  test("retry-free run is unchanged vs per-stage aggregation; foreign stages ignored") {
    val lis = new QueryIoListener
    lis.registerStage(1, G)
    lis.registerStage(2, "graftbench:other#1")
    (1 to 5).foreach(_ => lis.onTaskEnd(Bridge.taskEndEvent(1, 0, 7, 3, 0)))
    lis.onTaskEnd(Bridge.taskEndEvent(2, 0, 1000, 1000, 1000))
    // a stage never registered to any group (sweep jobs, warm-up) is dropped
    lis.onTaskEnd(Bridge.taskEndEvent(99, 0, 1000, 1000, 1000))
    assert(lis.ioForGroup(G) == ((35L, 15L, 0L)))
    assert(lis.ioForGroup("graftbench:other#1") == ((1000L, 1000L, 1000L)))
    assert(lis.ioForGroup("graftbench:absent#1") == ((0L, 0L, 0L)))
  }
}
