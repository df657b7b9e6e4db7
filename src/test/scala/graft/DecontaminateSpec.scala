package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Decontaminate

class DecontaminateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("flags exactly the docs sharing an n-gram, with exact overlap counts") {
    import spark.implicits._
    val evalDoc = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val train = Seq(
      // contains eval tokens 1..8 and 2..9 as 8-gram spans → 2 shared grams
      1L -> "alpha beta gamma delta epsilon zeta eta theta iota something else",
      // same 8 tokens but scrambled → no shared 8-gram
      2L -> "beta alpha delta gamma zeta epsilon theta eta iota kappa",
      3L -> "completely unrelated text with enough tokens to form many grams here"
    ).toDF("doc_id", "text")
    val eval = Seq(evalDoc).toDF("text")
    val out = Decontaminate.contaminatedDocs(train, "doc_id", "text", eval, "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L), s"got $out")
  }

  test("normalization bridges case and punctuation drift between corpora") {
    import spark.implicits._
    val train = Seq(1L -> "Alpha, beta GAMMA delta; epsilon zeta eta theta!")
      .toDF("doc_id", "text")
    val eval = Seq("alpha beta gamma delta epsilon zeta eta theta").toDF("text")
    val out = Decontaminate.contaminatedDocs(train, "doc_id", "text", eval, "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L), s"got $out")
  }

  test("docs shorter than n tokens yield no grams (no degraded short grams)") {
    import spark.implicits._
    val df = Seq(1L -> "only five tokens right here").toDF("doc_id", "text")
    val grams = Decontaminate.gramSets(df, "doc_id", "text", n = 8)
      .select(size(col("grams"))).head().getInt(0)
    assert(grams == 0)
    val exact = Decontaminate.gramSets(df, "doc_id", "text", n = 5)
      .select(col("grams")).head().getSeq[String](0)
    assert(exact == Seq("only five tokens right here"))
  }

  test("dropContaminated removes exactly the flagged docs, schema intact") {
    import spark.implicits._
    val train = Seq(
      1L -> "alpha beta gamma delta epsilon zeta eta theta iota something else",
      2L -> "beta alpha delta gamma zeta epsilon theta eta iota kappa",
      3L -> "completely unrelated text with enough tokens to form many grams here"
    ).toDF("doc_id", "text")
    val eval = Seq("alpha beta gamma delta epsilon zeta eta theta iota kappa")
      .toDF("text")
    val kept = Decontaminate.dropContaminated(train, "doc_id", "text", eval, "text")
    assert(kept.columns.toSeq == Seq("doc_id", "text"))
    assert(kept.select("doc_id").collect().map(_.getLong(0)).toSet == Set(2L, 3L))
  }

  test("plan broadcasts the eval gram set; train side never sort-merge joins") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val q = Decontaminate.contaminatedDocs(
      docs.filter(col("source") =!= "src0"), "doc_id", "text",
      docs.filter(col("source") === "src0"), "text")
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"eval grams not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"train side shuffled for the join:\n$p")
  }
}
