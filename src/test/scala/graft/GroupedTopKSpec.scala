package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GroupedTopK
import graft.testkit.DatasetComparisons._

class GroupedTopKSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def windowTopK(
      df: org.apache.spark.sql.DataFrame,
      groupCols: Seq[String],
      orderCols: Seq[org.apache.spark.sql.Column],
      k: Int) = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
  }

  test("topKPerGroup equals the window formulation on real events") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select("event_id", "user_id", "event_type", "value")
    val got = GroupedTopK.topKPerGroup(
      ev, Seq("event_type"), Seq(col("value"), col("event_id")), 3)
    val want = windowTopK(ev, Seq("event_type"), Seq(col("value"), col("event_id")), 3)
      .select(got.columns.map(col): _*)
    got.ensureDatasetEquals(want)
  }

  test("skewed fixture: hot group, small groups (< k), ties, multi-group keys") {
    import spark.implicits._
    // group "hot" has 200 rows with heavy value ties (id breaks them);
    // "tiny" has 2 rows (< k — must keep both); "neg" exercises negatives
    val rows =
      (1 to 200).map(i => ("hot", "a", i.toLong, (i % 5).toDouble)) ++
        Seq(("tiny", "a", 900L, 1.0), ("tiny", "a", 901L, 0.5)) ++
        (1 to 30).map(i => ("neg", "b", 1000L + i, -i.toDouble))
    val df = rows.toDF("g1", "g2", "id", "v").repartition(7)
    val order = Seq(col("v"), col("id"))
    val got = GroupedTopK.topKPerGroup(df, Seq("g1", "g2"), order, 5)
    val want = windowTopK(df, Seq("g1", "g2"), order, 5)
      .select(got.columns.map(col): _*)
    got.ensureDatasetEquals(want)
    // partitioning-independence: same result from a different layout
    val got1 = GroupedTopK.topKPerGroup(df.repartition(1), Seq("g1", "g2"), order, 5)
    got1.ensureDatasetEquals(want)
  }

  test("descending encodes as negation; k larger than any group keeps everything") {
    import spark.implicits._
    val df = Seq(("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0), ("b", 4L, 5.0))
      .toDF("g", "id", "v")
    val got = GroupedTopK.topKPerGroup(df, Seq("g"), Seq(negate(col("v")), col("id")), 2)
      .drop("rank")
    // top-2 by v DESC: a → (2, 30), (3, 20); b → (4, 5)
    val want = Seq(("a", 2L, 30.0), ("a", 3L, 20.0), ("b", 4L, 5.0)).toDF("g", "id", "v")
    got.ensureDatasetEquals(want)
    val all = GroupedTopK.topKPerGroup(df, Seq("g"), Seq(col("v"), col("id")), 100)
    assert(all.count() == 4)
  }

  test("ascending=false equals the desc window form — incl. STRING order keys") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, "zeta"), ("a", 2L, "alpha"), ("a", 3L, "midway"),
      ("b", 4L, "beta"), ("b", 5L, "beta")) // tie on the string key
      .toDF("g", "id", "name")
    val got = GroupedTopK.topKPerGroup(
      df, Seq("g"), Seq(col("name"), col("id")), 2, ascending = false)
    val w = Window.partitionBy("g").orderBy(col("name").desc, col("id").desc)
    val want = df.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= 2).select(got.columns.map(col): _*)
    got.ensureDatasetEquals(want)
  }

  test("plan: partial top_k below the ONE exchange — bounded shuffle, no window sort") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select("event_id", "event_type", "value")
    val q = GroupedTopK.topKPerGroup(
      ev, Seq("event_type"), Seq(col("value"), col("event_id")), 3)
    val p = q.queryExecution.executedPlan.toString
    val exIdx = p.indexOf("Exchange hashpartitioning")
    assert(exIdx > 0, s"no hash exchange in top-k plan:\n$p")
    assert(p.substring(exIdx).contains("partial_top_k"),
      s"no map-side partial top-k aggregate below the exchange:\n$p")
    assert("Exchange".r.findAllIn(p).size == 1,
      s"grouped top-k must be a single-exchange aggregate:\n$p")
    assert(!p.contains("Window"),
      s"grouped top-k must not fall back to a window sort:\n$p")
  }

  test("SQL surface: top_k registered and usable from spark.sql") {
    graft.functions.GraftFunctions.register(spark)
    spark.read.parquet(s"$sf/events.parquet").createOrReplaceTempView("ev_topk")
    val got = spark.sql(
      """SELECT top_k(struct(value, event_id), 2) AS t
        |FROM ev_topk GROUP BY event_type""".stripMargin)
    val rows = got.collect()
    assert(rows.nonEmpty && rows.forall(_.getSeq[Any](0).size <= 2))
  }
}
