package graft

import org.apache.spark.sql.functions._

/** r16 (VERDICT task 6): the persisted-sketch-table SQL surface. Each
  * mergeable sketch family must be re-aggregatable by a PURE-SQL user —
  * either through a registered merge aggregate (kmv_merge, cms_merge) or
  * because the representation's merge IS plain SQL (HLL register tables,
  * corr moment tables) — and the merged result must equal sketching /
  * aggregating the raw union directly (the monoid property the whole
  * sketch-table pattern rests on). */
class SketchSqlSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def events = spark.read.parquet(s"$sf/events.parquet")
    .withColumn("day", to_date(col("ts")))

  test("kmv_merge SQL rollup of a persisted sketch table equals sketching the union") {
    graft.functions.GraftFunctions.register(spark)
    val daily = graft.sketch.KmvOps.kmvSketch(
      events, Seq("event_type", "day"), "user_id", k = 16)
    daily.createOrReplaceTempView("t_kmv_daily")
    // pure SQL: no Scala operator anywhere in the rollup path
    val sqlMerged = spark.sql(
      """SELECT event_type, kmv_merge(kmv_sketch, 16) AS kmv_sketch
        |FROM t_kmv_daily GROUP BY event_type""".stripMargin)
    val direct = graft.sketch.KmvOps.kmvSketch(
      events, Seq("event_type"), "user_id", k = 16)
    val a = sqlMerged.collect().map(r =>
      r.getString(0) -> r.getSeq[Long](1)).toMap
    val b = direct.collect().map(r =>
      r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(a == b, s"sql-merged sketches != direct sketches")
  }

  test("kmv_merge SQL form plans identically to the Column API") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq((1L, Seq(1L, 5L)), (1L, Seq(2L, 9L)), (2L, Seq(3L, 4L)))
      .toDF("g", "sk")
    df.createOrReplaceTempView("t_kmv_merge_sql")
    val sqlForm = spark.sql(
      "SELECT g, kmv_merge(sk, 4) AS m FROM t_kmv_merge_sql GROUP BY g")
    val colForm = df.groupBy("g")
      .agg(graft.functions.KmvMergeAgg.kmvMerge(col("sk"), 4).as("m"))
    assert(sqlForm.queryExecution.optimizedPlan.canonicalized ==
      colForm.queryExecution.optimizedPlan.canonicalized)
    assert(sqlForm.collect().map(_.toString).sorted.toSeq ==
      colForm.collect().map(_.toString).sorted.toSeq)
    // k sizes the aggregation buffer: literal only
    intercept[Exception] {
      spark.sql("SELECT kmv_merge(sk, g) FROM t_kmv_merge_sql").collect()
    }
  }

  test("cms_merge of per-day CMS blobs answers point queries like the global CMS") {
    graft.functions.GraftFunctions.register(spark)
    val daily = events.groupBy("event_type", "day")
      .agg(graft.sketch.CmsOps.cmsAgg(col("user_id")).as("cms"))
    daily.createOrReplaceTempView("t_cms_daily")
    val merged = spark.sql(
      """SELECT event_type, cms_merge(cms) AS cms
        |FROM t_cms_daily GROUP BY event_type""".stripMargin)
      .collect()
      .map(r => r.getString(0) ->
        graft.sketch.CmsOps.fromBytes(r.getAs[Array[Byte]]("cms"))).toMap
    val globals = events.groupBy("event_type")
      .agg(graft.sketch.CmsOps.cmsAgg(col("user_id")).as("cms"))
      .collect()
      .map(r => r.getString(0) ->
        graft.sketch.CmsOps.fromBytes(r.getAs[Array[Byte]]("cms"))).toMap
    assert(merged.keySet == globals.keySet)
    // cellwise-sum merge => identical estimates for EVERY query point
    val users = events.select("user_id").distinct().limit(50)
      .collect().map(_.getLong(0))
    for ((et, m) <- merged; u <- users)
      assert(m.estimateCount(u) == globals(et).estimateCount(u),
        s"estimate diverged for ($et, $u)")
  }

  test("cms_merge SQL form plans identically to the Column API; all-NULL group is NULL") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val blob: Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.spark.util.sketch.CountMinSketch.create(0.01, 0.99, 1)
        .writeTo(out)
      out.toByteArray
    }
    val df = Seq((1L, blob), (1L, blob), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("g", "cms")
    df.createOrReplaceTempView("t_cms_merge_sql")
    val sqlForm = spark.sql(
      "SELECT g, cms_merge(cms) AS m FROM t_cms_merge_sql GROUP BY g")
    val colForm = df.groupBy("g")
      .agg(graft.functions.CmsMergeAgg.cmsMerge(col("cms")).as("m"))
    assert(sqlForm.queryExecution.optimizedPlan.canonicalized ==
      colForm.queryExecution.optimizedPlan.canonicalized)
    val rows = sqlForm.collect().map(r => r.getLong(0) -> r.get(1)).toMap
    assert(rows(1L) != null, "merged group must carry a sketch")
    assert(rows(2L) == null, "an all-NULL group has no sketch shape to invent")
  }

  test("HLL register tables merge with plain SQL max(): shard rollup equals direct registers") {
    // no custom function NEEDED here — that is the point being pinned:
    // the row-grain (bucket, reg) representation's merge IS standard SQL
    val ev = events.withColumn("shard", expr("event_id % 4"))
    graft.sketch.HllOps.hllRegisters(ev, Seq("shard"), "user_id", p = 8)
      .createOrReplaceTempView("t_hll_shards")
    val merged = spark.sql(
      "SELECT bucket, max(reg) AS reg FROM t_hll_shards GROUP BY bucket")
    val direct = graft.sketch.HllOps.hllRegisters(ev, Seq(), "user_id", p = 8)
    import graft.testkit.DatasetComparisons._
    merged.ensureDatasetEquals(direct)
  }

  test("corr moment tables re-aggregate with plain SQL sums: sharded r2 equals direct") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"),
        col("l_quantity").cast("long").as("x"),
        expr("cast(l_extendedprice * 100 as long)").as("y"))
      .na.drop(Seq("x", "y"))
    li.withColumn("shard", expr("l_orderkey % 4"))
      .createOrReplaceTempView("t_corr_rows")
    // per-shard moment table, then a plain-SUM rollup — both pure SQL
    val r2Sql = spark.sql(
      """WITH m AS (
        |  SELECT shard, cast(count(1) as decimal(38,0)) AS n,
        |    sum(cast(x as decimal(38,0))) AS sx,
        |    sum(cast(y as decimal(38,0))) AS sy,
        |    sum(cast(x as decimal(38,0)) * cast(x as decimal(38,0))) AS sxx,
        |    sum(cast(y as decimal(38,0)) * cast(y as decimal(38,0))) AS syy,
        |    sum(cast(x as decimal(38,0)) * cast(y as decimal(38,0))) AS sxy
        |  FROM t_corr_rows GROUP BY shard),
        |t AS (SELECT sum(n) AS n, sum(sx) AS sx, sum(sy) AS sy,
        |    sum(sxx) AS sxx, sum(syy) AS syy, sum(sxy) AS sxy FROM m)
        |SELECT cast(case when (n*sxx - sx*sx) = 0 or (n*syy - sy*sy) = 0
        |    then null else
        |    (abs(n*sxy - sx*sy) * 1000 div (n*sxx - sx*sx)) *
        |    (abs(n*sxy - sx*sy) * 1000 div (n*syy - sy*sy)) end as bigint)
        |  AS r2_ppm
        |FROM t""".stripMargin).head().get(0)
    val direct = graft.operators.Correlation
      .corrMatrixExact(li.select("x", "y"), Seq("x", "y"))
      .head().getAs[Any]("r2_ppm")
    assert(r2Sql == direct,
      s"sharded-moment SQL r2 ($r2Sql) != corrMatrixExact ($direct)")
  }

  // ——— build-k compatibility is MACHINE-CHECKED (r17, VERDICT task 3):
  // kmvSketch persists `kmv_k` beside every sketch; merging at k > build k
  // must fail LOUDLY on every checked path, and the checked paths must be
  // transparent (identical results) when the ks are compatible.

  test("kmvMergeDistinct rejects a merge k larger than the persisted build k") {
    val daily8 = graft.sketch.KmvOps.kmvSketch(
      events, Seq("event_type", "day"), "user_id", k = 8)
    val e = intercept[Exception] {
      graft.sketch.KmvOps.kmvMergeDistinct(
        daily8, Seq("event_type"), "kmv_sketch", k = 16).collect()
    }
    assert(e.getMessage.contains("build-k mismatch"),
      s"expected the build-k mismatch error, got: ${e.getMessage}")
  }

  test("3-arg kmv_merge(sketch, kmv_k, k) rejects k > build k and equals the 2-arg form when compatible") {
    graft.functions.GraftFunctions.register(spark)
    val daily = graft.sketch.KmvOps.kmvSketch(
      events, Seq("event_type", "day"), "user_id", k = 16)
    daily.createOrReplaceTempView("t_kmv_daily_k")
    // compatible: checked 3-arg ≡ unchecked 2-arg, row for row
    val checked = spark.sql(
      """SELECT event_type, kmv_merge(kmv_sketch, kmv_k, 16) AS m
        |FROM t_kmv_daily_k GROUP BY event_type""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val unchecked = spark.sql(
      """SELECT event_type, kmv_merge(kmv_sketch, 16) AS m
        |FROM t_kmv_daily_k GROUP BY event_type""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(checked == unchecked)
    // incompatible: merge k 32 > build k 16 — loud per-row failure
    val e = intercept[Exception] {
      spark.sql(
        """SELECT event_type, kmv_merge(kmv_sketch, kmv_k, 32) AS m
          |FROM t_kmv_daily_k GROUP BY event_type""".stripMargin).collect()
    }
    assert(e.getMessage.contains("build-k mismatch") ||
      Option(e.getCause).exists(_.getMessage.contains("build-k mismatch")),
      s"expected the build-k mismatch error, got: ${e.getMessage}")
  }
}
