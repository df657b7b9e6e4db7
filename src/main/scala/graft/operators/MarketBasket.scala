package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent co-occurring item pairs ("market basket" affinity — the
  * 2-itemset core of Agrawal–Srikant's Apriori, which at web scale is
  * usually all anyone materializes): which items appear in the same
  * basket unusually often, with the marginals needed to derive
  * support/confidence/lift downstream.
  *
  * '''Plan shape (the 100-TB design).''' The pair explosion is a
  * per-basket self-equi-join, so its fan-out is basket-size² — bounded by
  * the data model (an order has items-per-order items), never corpus².
  * Pair counts are map-side-combined; the global top-k plans as
  * `TakeOrderedAndProject` (per-partition partial top-k, merged on the
  * driver — no global sort shuffle); marginals attach to the k surviving
  * rows via two broadcast-friendly joins of a k-row frame against the
  * item-count table. A mega-basket (one key with millions of items) is
  * the one shape that breaks the fan-out bound — cap or sample baskets
  * upstream if the data model allows them.
  */
object MarketBasket {

  /** Top-k item pairs by co-occurrence count, deterministic ties
    * (count desc, then item ids).
    *
    * @return (item_a, item_b, n_ab, n_a, n_b): co-occurrence count and
    *         both per-item basket counts — all exact integers.
    */
  def frequentPairs(
      baskets: DataFrame, basketCol: String, itemCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val items = baskets
      .select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .distinct()
    val itemCounts = items.groupBy(col("__i")).agg(count(lit(1)).as("n"))
    val topPairs = items.select(col("__b"), col("__i").as("item_a"))
      .join(items.select(col("__b"), col("__i").as("item_b")), "__b")
      .filter(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("n_ab"))
      .orderBy(col("n_ab").desc, col("item_a"), col("item_b"))
      .limit(k)
    topPairs
      .join(itemCounts.select(col("__i").as("item_a"), col("n").as("n_a")), Seq("item_a"))
      .join(itemCounts.select(col("__i").as("item_b"), col("n").as("n_b")), Seq("item_b"))
      .select("item_a", "item_b", "n_ab", "n_a", "n_b")
  }
}
