package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RollupMaintain

/** Property pin for the incremental-maintenance identity: for ANY base
  * fact set and ANY causal delta (retract a subset of absorbed facts,
  * insert arbitrary new ones), `applyAggDelta(rollup(base), delta)` must
  * equal `rollup(base ∖ retracted ∪ inserted)` exactly — counts, sums,
  * and group membership (fully-retracted groups absent). Seeded so the
  * gate is deterministic. */
class RollupMaintainPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val genCase: Gen[(Seq[(String, Long)], Seq[Int], Seq[(String, Long)])] =
    for {
      nBase <- Gen.choose(1, 40)
      base <- Gen.listOfN(nBase, for {
        k <- Gen.oneOf("a", "b", "c", "d", "e")
        v <- Gen.choose(-50L, 50L)
      } yield (k, v))
      // retract by INDEX into base so every retraction is causal
      retractIdx <- Gen.someOf(base.indices)
      nIns <- Gen.choose(0, 15)
      ins <- Gen.listOfN(nIns, for {
        k <- Gen.oneOf("a", "b", "c", "d", "e", "f") // f: delta-only group
        v <- Gen.choose(-50L, 50L)
      } yield (k, v))
    } yield (base, retractIdx.toSeq, ins)

  test("applyAggDelta(rollup(A), delta) == rollup(A \\ retracted ∪ inserted) (property)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def rollup(rows: Seq[(String, Long)]) =
      rows.toDF("k", "v").groupBy("k")
        .agg(count(lit(1)).as("n"), sum("v").as("v"))
    val prop = Prop.forAll(genCase) { case (base, retractIdx, ins) =>
      val retracted = retractIdx.map(base)
      val delta =
        retracted.map { case (k, v) => (k, v, "D") } ++
          ins.map { case (k, v) => (k, v, "I") }
      val got = RollupMaintain.applyAggDelta(
        rollup(base), delta.toDF("k", "v", "op"), Seq("k"), "n", Seq("v"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
      val surviving =
        base.indices.filterNot(retractIdx.toSet).map(base) ++ ins
      val want = surviving.groupBy(_._1).map { case (k, rs) =>
        (k, rs.size.toLong, rs.map(_._2).sum)
      }.toSet
      assert(got == want, s"base=$base retracted=$retracted ins=$ins")
      true
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30)
        .withInitialSeed(Seed(20260816L)), prop)
    assert(res.passed, res.status.toString)
  }
}
