package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.WinnowFingerprints.winnowFingerprints
import graft.llm.TextStats

class WinnowSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** The relational reference: posexplode the gram stream → per-doc
    * sliding window min (trailing windows shrink) → distinct. */
  private def relational(texts: Seq[String], k: Int, w: Int)
      : Map[Long, Set[Long]] = {
    import spark.implicits._
    val wdw = Window.partitionBy("id").orderBy("pos")
      .rowsBetween(Window.currentRow, w - 1)
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "norm")
      .select(col("id"), posexplode(TextStats.gramHashes(col("norm"), k)))
      .withColumn("fp", min(col("col")).over(wdw))
      .select("id", "fp").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
  }

  private def onePass(texts: Seq[String], k: Int, w: Int): Map[Long, Set[Long]] = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "norm")
      .select(col("id"), explode(winnowFingerprints(col("norm"), k, w)).as("fp"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
  }

  test("bit-identical to the relational window-min form, incl. edge shapes") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaaaaaaaa",          // degenerate: one distinct gram
      "abcdefghijk",                       // chars < k for k=12 → one gram
      "",                                  // empty → one empty gram
      "ab",                                // far shorter than k
      "abab abab abab abab abab abab",     // periodic → heavy min repeats
      "z9 y8 x7 w6 v5 u4 t3 s2 r1 q0 p9 o8 n7 m6")
    for ((k, w) <- Seq((12, 8), (8, 4), (5, 1), (1, 3))) {
      val want = relational(texts, k, w)
      val got = onePass(texts, k, w)
      assert(got == want, s"mismatch at k=$k w=$w")
    }
  }

  test("non-ASCII fallback hashes the same char-based grams") {
    // é is 2 bytes / 1 char: numBytes != numChars exercises the
    // substringSQL fallback; grams are CHAR windows, matching substr()
    val texts = Seq("héllo wörld égalité fraternité", "naïve café déjà vu")
    val want = relational(texts, 5, 3)
    val got = onePass(texts, 5, 3)
    assert(got == want)
  }

  test("sorted distinct output and interpreted eval agree with codegen") {
    import spark.implicits._
    val df = Seq("the quick brown fox jumps over the lazy dog and runs")
      .toDF("norm")
    val viaPlan = df.select(winnowFingerprints(col("norm"), 12, 8).as("fp"))
      .collect().head.getSeq[Long](0)
    assert(viaPlan == viaPlan.sorted && viaPlan.distinct == viaPlan)
    val viaEval = graft.functions.WinnowFingerprints
      .compute(org.apache.spark.unsafe.types.UTF8String.fromString(
        "the quick brown fox jumps over the lazy dog and runs"), 12, 8)
      .toLongArray().toSeq
    assert(viaEval == viaPlan)
  }

  test("plan: fingerprint branch windows ONLY in the bounded rescue, never per gram row") {
    import spark.implicits._
    val df = Seq((1L, "some document text body"), (2L, "other document text"))
      .toDF("doc_id", "text")
    val plan = graft.llm.Dedup.winnowDedupPairs(df, "doc_id", "text")
      .queryExecution.executedPlan
    // pre-r14 this plan had ZERO windows (the one-pass codegen'd
    // winnowing replaced the posexplode → per-doc window-min form). The
    // r14 over-cap rescue adds exactly ONE window — partitioned by the
    // fingerprint bucket and fed only rows of (cap, 8×cap] buckets, so
    // its per-partition row count is rescueLimit-bounded by construction.
    // A second window, or a partitionless one, is a regression.
    def windows(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.window.WindowExec] = p.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        windows(a.executedPlan)
      case w: org.apache.spark.sql.execution.window.WindowExec => Seq(w)
    }.flatten
    val ws = windows(plan)
    assert(ws.size == 1, s"expected exactly the rescue window, got ${ws.size}:\n$plan")
    assert(ws.head.partitionSpec.nonEmpty, "rescue window must be bucket-partitioned")
  }
}
