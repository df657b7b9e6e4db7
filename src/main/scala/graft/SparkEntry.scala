package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.skew.SkewJoin._
import graft.skew.{LeftSkew, RightSkew, SkewJoinConf}

/** Driver contract — one `queries` entry (+ oracle SQL where expressible) per
  * implemented operator from SURVEY.md §2.
  *
  * Oracle-safety conventions: aggregate outputs only sum integral-valued
  * doubles (`l_quantity`) or integers; non-integral doubles appear only under
  * order-independent min/max — so Spark and DuckDB results are bit-identical.
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Flagship: skew join lineitem ⋈ orders + aggregate. Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("skewjoin_inner")(spark, "/root/testdata/sf0.001")

  // A tighter replication factor than the 1e-3 default so the skew machinery
  // actually engages at test scale (hot keys have freq ~10..10k there, not 2000+).
  private val testConf = SkewJoinConf(replicationFactor = 0.05)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          count(lit(1)).as("n_rows"),
          max("l_extendedprice").as("max_price"),
          min("l_discount").as("min_disc"))
    }),

    "skewjoin_inner" -> ((s, dir) => {
      val o = t(s, dir, "orders").withColumnRenamed("o_orderkey", "l_orderkey")
      t(s, dir, "lineitem")
        .skewJoin(o, Seq("l_orderkey"), "inner", testConf)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))
    }),

    "skewjoin_left" -> ((s, dir) => {
      // ~0.4% of orders have no lineitems → the outer anti-union leg is live.
      val li = t(s, dir, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey")
      t(s, dir, "orders")
        .skewJoin(li, Seq("o_orderkey"), "left_outer", testConf)
        .groupBy("o_orderstatus")
        .agg(
          count(lit(1)).as("n"),
          count(col("l_linenumber")).as("n_matched"),
          sum(col("l_quantity")).as("sum_qty"))
    }),

    "skewjoin_right" -> ((s, dir) => {
      val p = t(s, dir, "part").withColumnRenamed("p_partkey", "l_partkey")
      t(s, dir, "lineitem")
        .skewJoin(p, Seq("l_partkey"), "right_outer", testConf)
        .groupBy("p_size")
        .agg(
          count(lit(1)).as("n"),
          count(col("l_orderkey")).as("n_matched"),
          min(col("l_quantity")).as("min_qty"))
    }),

    "skewjoin_full" -> ((s, dir) => {
      val p = t(s, dir, "part").withColumnRenamed("p_partkey", "l_partkey")
      t(s, dir, "lineitem")
        .skewJoin(p, Seq("l_partkey"), "full_outer", testConf)
        .groupBy("p_brand")
        .agg(
          count(lit(1)).as("n"),
          count(col("l_orderkey")).as("n_left"),
          count(col("p_name")).as("n_right"))
    }),

    "skewjoin_multicol" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val a = li.select("l_orderkey", "l_linenumber", "l_quantity")
      val b = li.select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice").as("b_price"))
      a.skewJoin(b, Seq("l_orderkey", "l_linenumber"), "inner", testConf)
        .agg(
          count(lit(1)).as("n"),
          sum("l_quantity").as("sum_qty"),
          max("b_price").as("max_price"))
    }),

    "skewjoin_semi" -> ((s, dir) => {
      val o = t(s, dir, "orders").withColumnRenamed("o_custkey", "c_custkey")
      t(s, dir, "customer")
        .skewJoin(o, Seq("c_custkey"), "left_semi", testConf)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"))
    }),

    "skewjoin_anti" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey")
      t(s, dir, "orders")
        .skewJoin(li, Seq("o_orderkey"), "left_anti", testConf)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        |count(*) AS n_rows, max(l_extendedprice) AS max_price,
        |min(l_discount) AS min_disc
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "skewjoin_inner" ->
      """SELECT o_orderpriority, count(*) AS n, sum(l_quantity) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,

    "skewjoin_left" ->
      """SELECT o_orderstatus, count(*) AS n, count(l_linenumber) AS n_matched,
        |sum(l_quantity) AS sum_qty
        |FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderstatus""".stripMargin,

    "skewjoin_right" ->
      """SELECT p_size, count(*) AS n, count(l_orderkey) AS n_matched,
        |min(l_quantity) AS min_qty
        |FROM lineitem RIGHT JOIN part ON l_partkey = p_partkey
        |GROUP BY p_size""".stripMargin,

    "skewjoin_full" ->
      """SELECT p_brand, count(*) AS n, count(l_orderkey) AS n_left,
        |count(p_name) AS n_right
        |FROM lineitem FULL OUTER JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand""".stripMargin,

    "skewjoin_multicol" ->
      """SELECT count(*) AS n, sum(a.l_quantity) AS sum_qty,
        |max(b.l_extendedprice) AS max_price
        |FROM lineitem a JOIN lineitem b
        |ON a.l_orderkey = b.l_orderkey AND a.l_linenumber = b.l_linenumber""".stripMargin,

    "skewjoin_semi" ->
      """SELECT c_mktsegment, count(*) AS n FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment""".stripMargin,

    "skewjoin_anti" ->
      """SELECT o_orderpriority, count(*) AS n FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        |GROUP BY o_orderpriority""".stripMargin,
  )
}
