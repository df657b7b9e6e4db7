package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Constraints
import graft.sources.Constraints.Constraint._

class ConstraintsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def report(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long, Boolean)] =
    df.collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap

  test("row-level constraints share one pass and count NULLs as violations") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a"), Some(10.0)),
      (2L, Some("b"), Some(500.0)),  // range violation
      (3L, None: Option[String], Some(20.0)), // not-null + set + regex violations
      (4L, Some("zz"), None: Option[Double])  // set + regex(len) + range(null) violations
    ).toDF("id", "tag", "v")
    val got = report(Constraints.check(df, Seq(
      NotNull("tag"),
      InRange("v", 0.0, 100.0),
      InSet("tag", Seq("a", "b")),
      Matches("tag", "[a-y]"))))
    assert(got("not_null(tag)") == ((1L, 4L, false)))
    assert(got("in_range(v)") == ((2L, 4L, false)))
    assert(got("in_set(tag)") == ((2L, 4L, false)))
    assert(got("matches(tag)") == ((2L, 4L, false)))
  }

  test("unique counts surplus rows; subset_of counts dangling foreign keys") {
    import spark.implicits._
    val df = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 13L), (3L, 99L))
      .toDF("k", "fk")
    val ref = Seq(10L, 11L, 12L, 13L).toDF("pk")
    val got = report(Constraints.check(df, Seq(
      Unique(Seq("k")),
      SubsetOf("fk", ref, "pk"))))
    assert(got("unique(k)") == ((2L, 5L, false)), "3 copies of k=1 → 2 surplus")
    assert(got("subset_of(fk,pk)") == ((1L, 5L, false)), "fk=99 dangles")
  }

  test("observed constraints ride an existing action as Observation metrics") {
    import spark.implicits._
    val df = Seq((1L, Some("a")), (2L, None: Option[String]), (3L, Some("zz")))
      .toDF("id", "tag")
    val (instrumented, obs) = Constraints.observed(df, Seq(
      NotNull("tag"), InSet("tag", Seq("a", "b"))))
    // the pipeline's own action — no extra scan for the metrics
    assert(instrumented.count() == 3)
    val m = obs.get
    assert(m("rows") == 3L)
    assert(m("not_null(tag)") == 1L)
    assert(m("in_set(tag)") == 2L)
    // shuffle-needing constraints are rejected loudly
    intercept[IllegalArgumentException] {
      Constraints.observed(df, Seq(Unique(Seq("id"))))
    }
  }

  test("k-anonymity counts rows in smaller-than-k QI groups; NULL is a QI value") {
    import spark.implicits._
    // QI (city): "a"×3, "b"×1, NULL×2 → k=2 violations = 1 (the lone "b");
    // k=3 violations = 1 + 2 (NULL group too)
    val df = Seq(
      (1L, Some("a")), (2L, Some("a")), (3L, Some("a")),
      (4L, Some("b")), (5L, None: Option[String]), (6L, None: Option[String]))
      .toDF("id", "city")
    val r2 = report(Constraints.check(df, Seq(KAnonymity(Seq("city"), 2))))
    assert(r2("k_anonymity(city,2)") == ((1L, 6L, false)))
    val r3 = report(Constraints.check(df, Seq(KAnonymity(Seq("city"), 3))))
    assert(r3("k_anonymity(city,3)") == ((3L, 6L, false)))
    val rPass = report(Constraints.check(
      df.filter(df("city") === "a"), Seq(KAnonymity(Seq("city"), 3))))
    assert(rPass("k_anonymity(city,3)") == ((0L, 3L, true)))
  }

  test("l-diversity counts rows in sensitive-homogeneous groups; NULL adds none") {
    import spark.implicits._
    // QI city "a": statuses {x, y} (diverse); "b": {x, x} (homogeneous —
    // k-anonymous at k=2 yet leaking); "c": {NULL} (0 distinct)
    val df = Seq(
      (1L, "a", Some("x")), (2L, "a", Some("y")),
      (3L, "b", Some("x")), (4L, "b", Some("x")),
      (5L, "c", None: Option[String]))
      .toDF("id", "city", "status")
    val r = report(Constraints.check(df, Seq(
      KAnonymity(Seq("city"), 2),
      LDiversity(Seq("city"), "status", 2))))
    // the homogeneity attack in one report: "b" passes k-anonymity but
    // fails l-diversity (2 rows), "c" fails both (1 row)
    assert(r("k_anonymity(city,2)") == ((1L, 5L, false)))
    assert(r("l_diversity(city,status,2)") == ((3L, 5L, false)))
    val rPass = report(Constraints.check(
      df.filter(df("city") === "a"), Seq(LDiversity(Seq("city"), "status", 2))))
    assert(rPass("l_diversity(city,status,2)") == ((0L, 2L, true)))
  }

  test("duplicate labels (same type+column twice) fail fast with a clear message") {
    import spark.implicits._
    val df = Seq((1L, 5.0)).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      Constraints.check(df, Seq(
        InRange("v", 0.0, 10.0),
        InRange("v", 2.0, 8.0))) // same label → would alias-collide at runtime
    }
    assert(e.getMessage.contains("duplicate constraint labels"))
    assert(e.getMessage.contains("in_range(v)"))
  }

  test("a fully-clean table passes every constraint") {
    import spark.implicits._
    val df = Seq((1L, "a", 5.0), (2L, "b", 6.0)).toDF("id", "tag", "v")
    val got = report(Constraints.check(df, Seq(
      NotNull("id"), Unique(Seq("id")), InRange("v", 0.0, 10.0),
      InSet("tag", Seq("a", "b")), Matches("tag", "[ab]"))))
    assert(got.values.forall { case (v, t, p) => v == 0L && t == 2L && p })
  }
}
