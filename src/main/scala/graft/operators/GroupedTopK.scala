package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TopKAgg

/** Exact per-group top-k WITHOUT shipping whole groups anywhere.
  *
  * The conventional `row_number().over(Window.partitionBy(group)
  * .orderBy(...)) <= k` co-locates EVERY row of each group in one task and
  * sorts it there — with one hot group (a dominant user, a dominant event
  * type) at 100 TB that is a straggler task sorting billions of rows to
  * keep k of them, and the exchange before it ships the entire table.
  * [[GroupedRank]] removes the single-task sort but still ranks (and
  * ships) every row. When only the top k per group are wanted, the right
  * plan is a bounded-state AGGREGATE: [[graft.functions.TopKAgg]] keeps
  * ≤ k rows of partial state per (group, map partition), map-side
  * combined like any sum, so the exchange carries at most k rows per
  * (group × map task) however hot the group — the classic limit-pushdown-
  * through-shuffle, expressed as a mergeable monoid.
  *
  * Contract: ascending — rank 1 is the SMALLEST row under `orderCols`'
  * lexicographic order (encode "largest first" by negating a numeric key).
  * `orderCols` should be a total order within each group (append an id) —
  * exactly the determinism requirement a window `row_number` has anyway;
  * the full input row rides behind the order keys in the compared struct,
  * so even order-key ties break deterministically (by payload), never by
  * partitioning. Rows where any order expression is NULL follow Spark's
  * struct ordering (NULLS FIRST ascending), matching the window form.
  */
object GroupedTopK {

  /** `df` reduced to each group's `k` smallest rows under `orderCols`
    * (`ascending = false`: the k LARGEST, rank 1 = largest — native
    * reverse ordering, so string and mixed keys need no negation
    * encoding), with `rankCol` (1-based) appended. Output columns =
    * input columns + `rankCol`; groups with fewer than k rows keep all
    * their rows. Equals the window formulation
    * `row_number().over(partitionBy(groupCols).orderBy(orderCols)) <= k`
    * (orderCols direction matching `ascending`) row-for-row when
    * `orderCols` is a total order. */
  def topKPerGroup(
      df: DataFrame,
      groupCols: Seq[String],
      orderCols: Seq[Column],
      k: Int,
      rankCol: String = "rank",
      ascending: Boolean = true): DataFrame = {
    require(groupCols.nonEmpty, "topKPerGroup needs at least one group column")
    require(orderCols.nonEmpty, "topKPerGroup needs at least one order column")
    require(k >= 1, "k must be at least 1")
    val cols = df.columns.toSeq
    require(!cols.contains(rankCol), s"rank column '$rankCol' already exists")
    // internal aliases must not collide with input columns — a clash
    // would surface as an opaque ambiguous-reference error downstream
    val internal = Seq("__topk", "__pos", "__s", "__row")
    val clash = cols.filter(internal.contains)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with topKPerGroup's " +
        s"internal aliases (${internal.mkString(", ")}); rename them first")
    // order keys FIRST (lexicographic struct compare), whole row behind
    // them — the payload never needs a re-join, and full-tie determinism
    // comes from the trailing row itself
    val keyed = struct(
      orderCols.zipWithIndex.map { case (c, i) => c.as(s"__o$i") } :+
        struct(cols.map(col): _*).as("__row"): _*)
    df.groupBy(groupCols.map(col): _*)
      .agg(TopKAgg.topK(keyed, k, reverse = !ascending).as("__topk"))
      .select(posexplode(col("__topk")).as(Seq("__pos", "__s")))
      .select(cols.map(c => col(s"__s.__row.$c").as(c)) :+
        (col("__pos") + 1).cast("int").as(rankCol): _*)
  }
}
