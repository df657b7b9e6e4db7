package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Multimodal, Sampling}

/** [[Multimodal.decodePgmStats]] (zero-codec parser: round-trip, comment
  * handling, loud malformed failures) and [[Sampling.apportionBudget]]
  * (exact budget conservation, largest-remainder tie order). */
class PgmApportionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def decode(payloads: (Long, Array[Byte])*) = {
    import spark.implicits._
    Multimodal.decodePgmStats(
      payloads.toSeq.toDS().map(p => Multimodal.ImageRecord(p._1, p._2)))
      .collect()
  }

  test("PGM round-trip: parser lands exactly on the generating formula") {
    val got = decode((7L, Multimodal.synthesizePgm(7L))).head
    // w = 8 + 7%6 = 9, h = 8 + 7%7 = 8; sum/max from the formula
    val vals = for (y <- 0 until 8; x <- 0 until 9)
      yield (7L * 43 + x * 7 + y * 23) % 256
    assert((got.width, got.height, got.gray_sum, got.gray_max) ==
      ((9L, 8L, vals.sum, vals.max)))
  }

  test("PGM parser: comments anywhere, arbitrary whitespace, still exact") {
    val text = "P2 # magic\n# full comment line\n 2  2 # dims\n255\n" +
      "0 10 # row\n\t250\n255\n"
    val got = decode((1L, text.getBytes("US-ASCII"))).head
    assert((got.width, got.height, got.gray_sum, got.gray_max) ==
      ((2L, 2L, 515L, 255L)))
  }

  test("PGM parser fails loudly on bad magic, truncation, out-of-range") {
    intercept[Exception](decode((1L, "P5 2 2 255 0 0 0 0".getBytes("US-ASCII"))))
    intercept[Exception](decode((1L, "P2 2 2 255 0 0 0".getBytes("US-ASCII"))))
    intercept[Exception](decode((1L, "P2 2 2 255 0 0 0 256".getBytes("US-ASCII"))))
    intercept[Exception](decode((1L, "P2 2 2 255 0 0 0 0 0".getBytes("US-ASCII"))))
  }

  test("apportionBudget: hand-checked largest-remainder picks and tie order") {
    import spark.implicits._
    // counts a=5, b=3, c=2 (N=10), budget 7: quotas 3.5/2.1/1.4 →
    // bases 3/2/1 (Σ=6, short 1); remainders 5/1/4 → the unit goes to a
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c")).toDF("g")
    val got = Sampling.apportionBudget(df, "g", budget = 7L)
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getLong(4)))).toMap
    assert(got == Map("a" -> ((3L, 4L)), "b" -> ((2L, 2L)), "c" -> ((1L, 1L))))
  }

  test("apportionBudget: Σalloc = budget exactly for random shapes") {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    for (trial <- 1 to 5) {
      val groups = (1 to 2 + rng.nextInt(6)).map(i => s"s$i")
      val rows = groups.flatMap(g => Seq.fill(1 + rng.nextInt(50))(g))
      val budget = rng.nextInt(200).toLong
      val out = Sampling.apportionBudget(rows.toDF("g"), "g", budget)
      val total = out.agg(org.apache.spark.sql.functions.sum("alloc"))
        .head().getLong(0)
      assert(total == budget, s"trial $trial: Σalloc $total != $budget")
    }
  }
}
