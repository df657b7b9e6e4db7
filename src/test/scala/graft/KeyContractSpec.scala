package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.KeyContract

/** The opt-in primary-key gate (r17, VERDICT task 1): off by default with
  * the IDENTICAL plan (bench fingerprints must not move), eager and loud
  * in strict mode — the failure mode of every keyed operator under a bad
  * ingest (NULL / duplicate ids) is this registered error, never silent
  * mis-dedup. `scripts/fuzzcheck.py`'s BADKEY_REJECT matches on
  * [[KeyContract.MSG]]; the bad-key fuzz family (FuzzCorpus seeds ≤ -100)
  * drives the full query surface through it. */
class KeyContractSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def withMode[A](mode: Option[String])(f: => A): A = {
    val key = "graft.keycheck"
    val before = spark.conf.getOption(key)
    try {
      mode match {
        case Some(m) => spark.conf.set(key, m)
        case None => spark.conf.unset(key)
      }
      f
    } finally {
      before match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("default mode is a pass-through: same object, zero plan change") {
    import spark.implicits._
    val df = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("id", "x")
    withMode(None) {
      assert(KeyContract.checked(df, "id") eq df)
    }
    withMode(Some("off")) {
      assert(KeyContract.checked(df, "id") eq df)
    }
  }

  test("strict mode passes a clean key untouched") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "x")
    withMode(Some("strict")) {
      assert(KeyContract.checked(df, "id").count() == 3L)
    }
  }

  test("strict mode rejects duplicate ids with the registered message") {
    import spark.implicits._
    val df = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("id", "x")
    withMode(Some("strict")) {
      val e = intercept[IllegalArgumentException] {
        KeyContract.checked(df, "id")
      }
      assert(e.getMessage.contains(KeyContract.MSG))
      assert(e.getMessage.contains("'id'"))
      assert(e.getMessage.contains("1 surplus duplicate rows"))
    }
  }

  test("strict mode rejects NULL ids and counts them exactly") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(java.lang.Long.valueOf(1L), "a"),
        org.apache.spark.sql.Row(null, "b"),
        org.apache.spark.sql.Row(null, "c"))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType, nullable = true),
        org.apache.spark.sql.types.StructField("x",
          org.apache.spark.sql.types.StringType, nullable = true))))
    withMode(Some("strict")) {
      val e = intercept[IllegalArgumentException] {
        KeyContract.checked(df, "id")
      }
      assert(e.getMessage.contains(KeyContract.MSG))
      assert(e.getMessage.contains("2 NULL ids"))
    }
  }

  test("strict mode accepts an empty table (no violating rows)") {
    import spark.implicits._
    val df = Seq.empty[(Long, String)].toDF("id", "x")
    withMode(Some("strict")) {
      assert(KeyContract.checked(df, "id").count() == 0L)
    }
  }
}
