package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: each left row is paired with the single nearest
  * right row in time within the same key group — the standard operator for
  * joining events to slowly-changing reference data (prices, rates, the most
  * recent prior action of a user).
  *
  * The reference engine has no temporal join; this is north-star extension
  * surface (SURVEY.md §2.4 family). Semantics follow the common
  * `merge_asof` / SQL `ASOF JOIN` contract:
  *
  *  - direction `"backward"` (default): match the right row with the largest
  *    `rightTimeCol` ≤ the left row's `leftTimeCol` (inclusive);
  *  - direction `"forward"`: smallest `rightTimeCol` ≥ `leftTimeCol`;
  *  - `joinType` `"left"` keeps unmatched left rows with nulls, `"inner"`
  *    drops them;
  *  - a left row with a null time matches nothing; right rows with null
  *    times never match;
  *  - JOIN null semantics on keys: a NULL key never matches — not even
  *    another NULL (the window implementation would otherwise give NULL
  *    keys GROUP BY semantics, silently pairing null-key rows; r15
  *    differential fuzz finding). Null-key left rows survive a left join
  *    unmatched.
  *
  * '''Plan shape (the 100-TB design).''' A naive formulation is a range
  * join (`l.key = r.key AND r.t <= l.t`) + per-left-row argmax: Spark plans
  * the non-equi conjunct as a join filter, so every key group degenerates to
  * |L|·|R| pairs — quadratic in group size. Instead both inputs are tagged
  * and UNIONed, and one running `last(rightPayload, ignoreNulls)` window per
  * key, ordered by (time, tag), carries the most recent right payload onto
  * each left row:
  *
  *  - ONE hash shuffle of |L| + |R| rows on the key columns — the same cost
  *    as the equi-join's own exchange, with no replication;
  *  - the window frame is `unboundedPreceding → currentRow`, i.e. a running
  *    aggregate: rows stream through in sort order, nothing is buffered;
  *  - at equal timestamps right rows sort before (backward) / after
  *    (forward) left rows, which is exactly the inclusive bound.
  *
  * Ties between right rows sharing (key, time) resolve to the greatest
  * `tieBreakCol` when given (pass the right side's unique id for
  * deterministic output), otherwise to an arbitrary one.
  */
object AsofJoin {

  private val T = "__graft_asof_t"
  private val Src = "__graft_asof_src"
  private val Tie = "__graft_asof_tie"
  private val RPay = "__graft_asof_r"

  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      joinType: String = "left",
      direction: String = "backward",
      tieBreakCol: Option[String] = None): DataFrame = {
    require(keyCols.nonEmpty, "asofJoin requires at least one key column")
    require(Seq("left", "inner").contains(joinType),
      s"asofJoin supports joinType left|inner, got '$joinType'")
    require(Seq("backward", "forward").contains(direction),
      s"asofJoin supports direction backward|forward, got '$direction'")
    val rValCols = right.columns.toSeq.filterNot(keyCols.contains)
    val lCols = left.columns.toSeq
    val overlap = lCols.intersect(rValCols)
    require(overlap.isEmpty,
      s"asofJoin: non-key right columns collide with left columns: " +
        s"${overlap.mkString(", ")} — rename before joining")

    val lSchema = left.schema
    // presence marker inside the payload: a matched right row whose value
    // columns are all null must still count as matched for joinType=inner
    val Present = "__graft_asof_present"
    val rPayload = struct(lit(true).as(Present) +: rValCols.map(col): _*)
    val rPayloadType = {
      val r = right.select(rPayload)
      r.schema.head.dataType
    }
    val tieCol = tieBreakCol.map(col).getOrElse(lit(null))
    val tieType = tieBreakCol
      .map(c => right.schema(c).dataType)
      .getOrElse(org.apache.spark.sql.types.IntegerType)

    // Tagged union: left rows carry their own columns + a null right payload;
    // right rows carry nulls for the left columns + the payload struct.
    val lTagged = left.select(
      lCols.map(col) ++ Seq(
        col(leftTimeCol).as(T),
        lit(1).as(Src),
        lit(null).cast(tieType).as(Tie),
        lit(null).cast(rPayloadType).as(RPay)): _*)
    val rTagged = right
      // null time never matches; null KEY never matches either (join
      // semantics, not GROUP BY — see scaladoc) so those rows can be
      // dropped before the shuffle instead of poisoning the null-key
      // window partition
      .filter(col(rightTimeCol).isNotNull &&
        keyCols.map(col(_).isNotNull).reduce(_ && _))
      .select(
        lCols.map { c =>
          if (keyCols.contains(c)) col(c) else lit(null).cast(lSchema(c).dataType).as(c)
        } ++ Seq(
          col(rightTimeCol).as(T),
          lit(0).as(Src),
          tieCol.cast(tieType).as(Tie),
          rPayload.as(RPay)): _*)

    // backward: ascending time, right (0) before left (1) at equal t — the
    // running last right payload at a left row is the latest rightTime <= t.
    // forward: descending time mirrors it for rightTime >= t. Tie order puts
    // the greatest tieBreak nearest the left row, so `last` picks it.
    val ordering: Seq[Column] = direction match {
      case "backward" => Seq(col(T).asc, col(Src).asc, col(Tie).asc_nulls_first)
      case "forward"  => Seq(col(T).desc, col(Src).asc, col(Tie).asc_nulls_first)
    }
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = last(col(RPay), ignoreNulls = true).over(w)
    val out = lTagged.unionByName(rTagged)
      .withColumn(RPay, when(col(T).isNull, lit(null)).otherwise(matched))
      .filter(col(Src) === 1)
    val gated =
      if (joinType == "inner") out.filter(col(s"$RPay.$Present"))
      else out
    gated.select(
      lCols.map(col) ++ rValCols.map(c => col(s"$RPay.$c").as(c)): _*)
  }
}
