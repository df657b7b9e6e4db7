package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SigAgree

class SigAgreeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** The HOF formulation SigAgree replaces — the equivalence oracle. */
  private def hofAgree(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    size(filter(zip_with(a, b, (x, y) => x === y), p => p))

  test("bit-identical to the zip_with/filter/size formulation") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 400).map { i =>
      val n = rnd.nextInt(40)
      val a = Seq.fill(n)(rnd.nextLong() % 5) // small domain → real agreements
      val b = a.zipWithIndex.map { case (v, j) =>
        if (rnd.nextBoolean()) v else rnd.nextLong() % 5
      }
      (i.toLong, a, b)
    } ++ Seq(
      (1000L, Seq.empty[Long], Seq.empty[Long]),
      (1001L, Seq(1L, 2L, 3L), Seq.empty[Long]),
      // length mismatch: zip_with pads with NULL, NULL === x is NULL,
      // filter drops non-true — so the tail never counts
      (1002L, Seq(1L, 2L, 3L, 4L), Seq(1L, 2L)),
      (1003L, Seq(Long.MinValue, Long.MaxValue, 0L),
        Seq(Long.MinValue, Long.MaxValue, 0L)))
    val df = rows.toDF("id", "a", "b")
    val got = df.select(col("id"), SigAgree.sigAgree(col("a"), col("b")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val want = df.select(col("id"), hofAgree(col("a"), col("b")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == want)
    assert(got(1000L) == 0 && got(1001L) == 0 && got(1002L) == 2 && got(1003L) == 3)
  }

  test("null elements and null arrays match the HOF semantics") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq[java.lang.Long](1L, null, 3L), Seq[java.lang.Long](1L, null, 3L)),
      (2L, Seq[java.lang.Long](null, null), Seq[java.lang.Long](null, null)),
      (3L, null, Seq[java.lang.Long](1L))
    ).toDF("id", "a", "b")
    val got = df.select(col("id"), SigAgree.sigAgree(col("a"), col("b")).as("n"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getInt(1))).toMap
    val want = df.select(col("id"), hofAgree(col("a"), col("b")).as("n"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getInt(1))).toMap
    assert(got == want)
    // null elements never count; a NULL array input yields NULL overall
    assert(got(1L) == 2 && got(2L) == 0 && got(3L) == null)
  }

  test("codegen and interpreted paths agree") {
    import spark.implicits._
    val df = Seq((1L, Seq(1L, 2L, 3L, 4L), Seq(1L, 9L, 3L, 8L))).toDF("id", "a", "b")
    val viaCodegen = df.select(SigAgree.sigAgree(col("a"), col("b"))).head().getInt(0)
    // filter to a non-deterministic predicate forces interpreted eval path
    val expr = SigAgree(
      org.apache.spark.sql.graftshim.Bridge.expression(col("a")),
      org.apache.spark.sql.graftshim.Bridge.expression(col("b")))
    val row = df.select(struct(col("a"), col("b")).as("s")).head()
    assert(viaCodegen == 2)
    // direct interpreted eval over a literal InternalRow round-trip
    val a = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(1L, 2L, 3L, 4L))
    val b = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(1L, 9L, 3L, 8L))
    assert(expr.nullSafeEval(a, b) == 2)
  }
}
