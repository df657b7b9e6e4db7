package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Bridge

/** Point-in-interval (range) join: pair each left "point" row with every
  * right "interval" row whose half-open interval `[start, end)` contains the
  * point, optionally alongside equi-key columns — the standard operator for
  * "events within a time window of another event" feature pipelines.
  *
  * The reference engine has no range join; north-star extension surface
  * (SURVEY.md §2.4 family).
  *
  * '''Plan shape (the 100-TB design).''' Spark plans a bare
  * `l.t >= r.start AND l.t < r.end` conjunct as a BroadcastNestedLoopJoin
  * (all-pairs per key group): quadratic work and a broadcast of one whole
  * side. Instead the time axis is bucketed into fixed-width bins:
  *
  *  - each point maps to exactly ONE bin (`floor(t / binWidth)`);
  *  - each interval explodes to the bins it overlaps
  *    (`sequence(floor(start/w), floor((end-1)/w))` — `ceil(len/w)+1` rows,
  *    a small constant when `binWidth` is chosen near the typical interval
  *    length);
  *  - the join is then a plain equi-join on `(equiKeys…, bin)` — hash
  *    shuffle both sides, AQE/skew-handling applies — with the exact range
  *    predicate as a cheap post-filter.
  *
  * Because a point lives in exactly one bin, each qualifying (point,
  * interval) pair meets in exactly one bin: no duplicate results, no
  * `distinct()` pass. Degenerate intervals (`end <= start`) match nothing
  * and are dropped before the explode.
  */
object RangeJoin {

  /** Inner range join. `left` keeps all its columns; `right` keeps all its
    * columns; column sets must be disjoint. `binWidth` is in the units of
    * the point/bound columns (integral types). */
  def rangeJoin(
      left: DataFrame,
      pointCol: String,
      right: DataFrame,
      startCol: String,
      endCol: String,
      binWidth: Long,
      equiKeys: Seq[(String, String)] = Seq.empty): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val overlap = left.columns.toSeq.intersect(right.columns.toSeq)
    require(overlap.isEmpty,
      s"rangeJoin: column names collide across sides: ${overlap.mkString(", ")}" +
        " — rename before joining")

    // exact long floor-division: `floor(c / w)` promotes to double and rounds
    // above 2^53 (nanosecond epochs); integral DIV with a negative-dividend
    // adjustment keeps bin assignment exact at any magnitude
    def bin(c: Column): Column = {
      val cl = c.cast("long")
      val q = Bridge.column(new IntegralDivide(
        Bridge.expression(cl), Bridge.expression(lit(binWidth))))
      q - when(cl % binWidth < 0, lit(1L)).otherwise(lit(0L))
    }

    val lb = left
      .filter(col(pointCol).isNotNull)
      .withColumn("__graft_bin", bin(col(pointCol)))
    val rb = right
      .filter(col(startCol).isNotNull && col(endCol).isNotNull &&
        col(startCol) < col(endCol))
      .withColumn("__graft_bin",
        explode(sequence(bin(col(startCol)), bin(col(endCol) - 1))))

    val equi = equiKeys.map { case (lk, rk) => lb(lk) === rb(rk) }
    val range = lb(pointCol) >= rb(startCol) && lb(pointCol) < rb(endCol)
    val cond = (equi :+ (lb("__graft_bin") === rb("__graft_bin")) :+ range)
      .reduce(_ && _)
    lb.join(rb, cond).drop("__graft_bin")
  }

  /** Interval×interval overlap join: pair each left half-open interval
    * `[ls, le)` with every right interval `[rs, re)` it overlaps
    * (`ls < re AND rs < le`), optionally alongside equi-key columns —
    * "concurrent sessions", "overlapping validity windows", the
    * interval-interval sibling of [[rangeJoin]]'s point-in-interval.
    *
    * '''Plan shape (the 100-TB design).''' Same bin trick as
    * [[rangeJoin]], with one extra idea: BOTH sides explode to their
    * covering bins, and a pair would meet once per SHARED bin — so the
    * join additionally pins the met bin to the bin of the overlap's
    * START (`bin(greatest(ls, rs))`). The overlap start lies inside both
    * intervals, so both explosions cover that bin: every qualifying pair
    * meets exactly once, no `distinct()` pass, and the join stays a plain
    * equi-join on `(equiKeys…, bin)` with the exact overlap predicate as
    * a post-filter. Degenerate intervals (`end <= start`) match nothing
    * and are dropped before the explode. */
  def intervalOverlapJoin(
      left: DataFrame, lStartCol: String, lEndCol: String,
      right: DataFrame, rStartCol: String, rEndCol: String,
      binWidth: Long,
      equiKeys: Seq[(String, String)] = Seq.empty): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val overlap = left.columns.toSeq.intersect(right.columns.toSeq)
    require(overlap.isEmpty,
      s"intervalOverlapJoin: column names collide across sides: " +
        s"${overlap.mkString(", ")} — rename before joining")

    def bin(c: Column): Column = {
      val cl = c.cast("long")
      val q = Bridge.column(new IntegralDivide(
        Bridge.expression(cl), Bridge.expression(lit(binWidth))))
      q - when(cl % binWidth < 0, lit(1L)).otherwise(lit(0L))
    }
    def valid(s: String, e: String, df: DataFrame) =
      df.filter(col(s).isNotNull && col(e).isNotNull && col(s) < col(e))

    val lb = valid(lStartCol, lEndCol, left)
      .withColumn("__graft_bin",
        explode(sequence(bin(col(lStartCol)), bin(col(lEndCol) - 1))))
    val rb = valid(rStartCol, rEndCol, right)
      .withColumn("__graft_bin",
        explode(sequence(bin(col(rStartCol)), bin(col(rEndCol) - 1))))

    val equi = equiKeys.map { case (lk, rk) => lb(lk) === rb(rk) }
    val ovl = lb(lStartCol) < rb(rEndCol) && rb(rStartCol) < lb(lEndCol)
    val startBin = bin(greatest(lb(lStartCol), rb(rStartCol)))
    val cond = (equi :+ (lb("__graft_bin") === rb("__graft_bin")) :+
      ovl :+ (lb("__graft_bin") === startBin)).reduce(_ && _)
    lb.join(rb, cond).drop("__graft_bin")
  }
}
