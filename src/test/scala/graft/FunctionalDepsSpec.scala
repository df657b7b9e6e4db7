package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.FunctionalDeps

class FunctionalDepsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("holding and violated dependencies profile correctly over one frame") {
    import spark.implicits._
    val df = Seq(
      // id → city holds; city → id violated (two ids share "ny");
      // city → zip violated at exactly one key with 3 values
      (1L, "ny", "10001"),
      (2L, "ny", "10002"),
      (3L, "sf", "94103"),
      (4L, "ny", "10003"),
      (5L, "la", "90001")).toDF("id", "city", "zip")
    val got = FunctionalDeps.fdProfile(df, Seq(
      "id" -> "city", "city" -> "id", "city" -> "zip", "zip" -> "city"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(got(("id", "city")) == ((5L, 0L, 1L, true)))
    assert(got(("city", "id")) == ((3L, 1L, 3L, false))) // ny → {1,2,4}
    assert(got(("city", "zip")) == ((3L, 1L, 3L, false)))
    assert(got(("zip", "city")) == ((5L, 0L, 1L, true)))
  }

  test("NULLs on either side assert nothing (excluded from keys and values)") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("a")), (Some(1L), None), (None, Some("b")),
      (Some(2L), Some("c"))).toDF("k", "v")
    val got = FunctionalDeps.fdProfile(df, Seq("k" -> "v"))
      .collect().map(r =>
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
    // key 1 maps only to "a" (the NULL v row asserts nothing) → FD holds
    assert(got.toSeq == Seq((2L, 0L, 1L, true)))
  }

  test("giniStrength matches a BigInt reference and grades determination vs independence") {
    import spark.implicits._
    val rng = new scala.util.Random(31)
    // col a determines b (b = a mod 3 tag); c is independent noise
    val rows = (1 to 400).map { _ =>
      val a = rng.nextInt(9).toLong
      (a, s"t${a % 3}", s"n${rng.nextInt(3)}")
    }
    val got = FunctionalDeps.giniStrength(
      rows.toDF("a", "b", "c"), Seq("a" -> "b", "a" -> "c"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap

    def ref(pairs: Seq[(String, String)]): (Long, Long, Long, Long) = {
      val n = BigInt(pairs.size)
      val nb = pairs.groupBy(_._2).values.map(v => BigInt(v.size)).toSeq
      val gini = ((n * n - nb.map(x => x * x).sum) * 1000000 / (n * n)).toLong
      val cond = pairs.groupBy(_._1).values.map { grp =>
        val na = BigInt(grp.size)
        val ssq = grp.groupBy(_._2).values.map(v => BigInt(v.size))
          .map(x => x * x).sum
        ((na * na - ssq) * 1000000 / (n * na)).toLong
      }.sum
      (n.toLong, gini, cond, gini - cond)
    }
    val ab = ref(rows.map(r => (r._1.toString, r._2)))
    val ac = ref(rows.map(r => (r._1.toString, r._3)))
    assert(got(("a", "b")) == ab)
    assert(got(("a", "c")) == ac)
    // a → b is a true dependency: knowing a leaves zero rhs impurity
    assert(ab._3 == 0L && ab._4 == ab._2)
    // a ⫫ c: the drop is a small fraction of the marginal impurity
    assert(ac._4 * 5 < ac._2, s"independent pair drop too large: $ac")
  }

  test("cross-type values compare as strings: long 1 and string '1' don't collide keys") {
    import spark.implicits._
    // same lhs VALUE text from different columns is fine — candidates are
    // profiled independently (fd_id in the group key)
    val df = Seq((1L, "1", "x"), (1L, "1", "x")).toDF("a", "b", "c")
    val got = FunctionalDeps.fdProfile(df, Seq("a" -> "c", "b" -> "c"))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getBoolean(5))).toSet
    assert(got == Set(("a", 1L, true), ("b", 1L, true)))
  }
}
