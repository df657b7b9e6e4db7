package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group RUNNING MAX without a per-group single-task sort —
  * [[GroupedRank]]'s two-phase range-partition scheme applied to a
  * cumulative extremum instead of a rank:
  *
  *  1. range partition by `(group, order...)`;
  *  2. local running max within `(physical partition, group)` — window
  *     groups bounded by partition size, never group size;
  *  3. per-(partition, group) maxima form a tiny frame; a PREFIX MAX over
  *     partition id (strictly-preceding frame) gives each slice the max
  *     of everything before it, broadcast-joined back.
  *
  * `running = greatest(local, prefix)` is exact because range
  * partitioning puts every row of partition i before partition j > i in
  * `(group, order)` order. `orderCols` must totally order rows within a
  * group (ties could land in either adjacent partition — same contract
  * as GroupedRank).
  *
  * Same REUSE CORRECTNESS CONTRACT as GroupedRank: the offsets branch and
  * the join branch must read ONE physical range exchange (boundaries are
  * sampled per instance), so both are built from the single `ranged` val
  * with nothing between the exchange and the fork; do not differentiate
  * the branches below the exchange.
  */
object RunningExtremum {

  /** `df` plus `outCol`: the running max of `valueCol` over rows at or
    * before this one in `(groupCols, orderCols)` order, per group. */
  def withRunningMax(
      df: DataFrame,
      groupCols: Seq[String],
      orderCols: Seq[Column],
      valueCol: String,
      outCol: String = "running_max"): DataFrame = {
    require(df.sparkSession.sessionState.conf.exchangeReuseEnabled,
      "RunningExtremum requires spark.sql.exchange.reuse=true (range " +
        "boundaries are sampled per exchange instance; without reuse the " +
        "prefix maxima and the local maxima could disagree on partition ids)")
    require(!df.columns.contains(outCol),
      s"RunningExtremum: output column '$outCol' already exists")
    val internal = Seq("__graft_rmpid", "__graft_rmlocal", "__graft_rmoff",
      "__graft_rmpmax", "__graft_rmo_pid")
    require(df.columns.intersect(internal).isEmpty,
      s"RunningExtremum: input must not use internal names ${internal.mkString(", ")}")
    val ranged = df
      .repartitionByRange((groupCols.map(col) ++ orderCols): _*)
      .withColumn("__graft_rmpid", spark_partition_id())
    val wLocal = Window
      .partitionBy(("__graft_rmpid" +: groupCols).map(col): _*)
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val local = ranged.withColumn("__graft_rmlocal",
      max(col(valueCol)).over(wLocal))
    val partMax = local
      .groupBy(("__graft_rmpid" +: groupCols).map(col): _*)
      .agg(max(col(valueCol)).as("__graft_rmpmax"))
    val wOff = Window.partitionBy(groupCols.map(col): _*)
      .orderBy("__graft_rmpid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = partMax
      .withColumn("__graft_rmoff", max("__graft_rmpmax").over(wOff))
      .select(("__graft_rmpid" +: groupCols).map(col)
        :+ col("__graft_rmoff"): _*)
    val offR = groupCols.foldLeft(
        offsets.withColumnRenamed("__graft_rmpid", "__graft_rmo_pid")) {
        (d, c) => d.withColumnRenamed(c, s"__graft_rmo_$c")
      }
    // NULL-SAFE group equality (NULL is an ordinary group, as everywhere)
    val cond = (Seq(col("__graft_rmpid") === col("__graft_rmo_pid")) ++
      groupCols.map(c => col(c) <=> col(s"__graft_rmo_$c"))).reduce(_ && _)
    local
      .join(broadcast(offR), cond)
      .withColumn(outCol,
        greatest(col("__graft_rmlocal"),
          coalesce(col("__graft_rmoff"), col("__graft_rmlocal"))))
      .drop(Seq("__graft_rmpid", "__graft_rmlocal", "__graft_rmoff",
        "__graft_rmo_pid") ++ groupCols.map(c => s"__graft_rmo_$c"): _*)
  }
}
