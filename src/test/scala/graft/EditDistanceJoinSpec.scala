package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Dedup

class EditDistanceJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Reference DP — the ground truth the segment blocking must not lose
    * against. */
  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(b.length + 1)(identity)
    for (i <- 1 to a.length) {
      var prev = dp(0)
      dp(0) = i
      for (j <- 1 to b.length) {
        val cur = dp(j)
        dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(b.length)
  }

  private def norm(s: String): String =
    s.toLowerCase.replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ").trim

  private def bruteForce(docs: Seq[(Long, String)], d: Int): Set[(Long, Long, Int)] = {
    val nd = docs.map { case (id, t) => (id, norm(t)) }
    (for {
      (ia, ta) <- nd; (ib, tb) <- nd
      if ia < ib && math.abs(ta.length - tb.length) <= d
      dist = lev(ta, tb) if dist <= d
    } yield (ia, ib, dist)).toSet
  }

  private def run(docs: Seq[(Long, String)], d: Int): Set[(Long, Long, Int)] = {
    import spark.implicits._
    Dedup.editDistancePairs(docs.toDF("id", "txt"), "id", "txt", maxDist = d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  test("matches brute force on a corpus with planted edits (d=3)") {
    val rnd = new scala.util.Random(7)
    val alpha = "abcde "
    def randStr(n: Int) = Seq.fill(n)(alpha(rnd.nextInt(alpha.length))).mkString
    def mutate(s: String, k: Int): String = {
      var t = s
      for (_ <- 1 to k) {
        val p = if (t.isEmpty) 0 else rnd.nextInt(t.length)
        t = rnd.nextInt(3) match {
          case 0 if t.nonEmpty => t.take(p) + t.drop(p + 1)              // delete
          case 1 => t.take(p) + alpha(rnd.nextInt(alpha.length)) + t.drop(p) // insert
          case _ if t.nonEmpty =>
            t.take(p) + alpha(rnd.nextInt(alpha.length)) + t.drop(p + 1) // substitute
          case _ => t + alpha(rnd.nextInt(alpha.length))
        }
      }
      t
    }
    val seeds = (0 until 25).map(i => i.toLong -> randStr(12 + rnd.nextInt(30)))
    val variants = seeds.take(15).zipWithIndex.map { case ((id, s), i) =>
      (100L + id) -> mutate(s, 1 + i % 5) // some inside, some outside the budget
    }
    val far = (200L until 215L).map(i => i -> randStr(10 + rnd.nextInt(40)))
    val docs = seeds ++ variants ++ far
    assert(run(docs, 3) == bruteForce(docs, 3))
  }

  test("short stratum: strings at or below d+1 chars still pair exactly") {
    val docs = Seq[(Long, String)](
      1L -> "", 2L -> "a", 3L -> "ab", 4L -> "abcd", 5L -> "abcdefgh",
      6L -> "b", 7L -> "", 8L -> "xyzw")
    for (d <- 1 to 4)
      assert(run(docs, d) == bruteForce(docs, d), s"diverges at d=$d")
  }

  test("dropEditDuplicates: chains cluster transitively, min id survives") {
    import spark.implicits._
    // a→b and b→c are each within d=2, a→c is not (dist 4): one cluster
    val docs = Seq[(Long, String)](
      5L -> "abcdefghij",    // dist(5,3)=2
      3L -> "abcdefghxy",    // dist(3,8)=2
      8L -> "abcdefwzxy",    // chain end
      9L -> "unrelated text here")
    val kept = Dedup.dropEditDuplicates(docs.toDF("id", "txt"), "id", "txt", 2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L, 9L))
  }

  test("normalization applies before distance (case/punct collapse to dist 0)") {
    val docs = Seq[(Long, String)](
      10L -> "Hello,   World!", 11L -> "hello world", 12L -> "hello worlds")
    val got = run(docs, 2)
    assert(got == Set((10L, 11L, 0), (10L, 12L, 1), (11L, 12L, 1)))
  }
}
