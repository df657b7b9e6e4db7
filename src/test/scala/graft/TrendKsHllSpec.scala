package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{RobustStats, Trend}
import graft.sketch.HllOps

class TrendKsHllSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("groupedTrend: exact slopes, truncation toward zero, zero-variance NULL") {
    import spark.implicits._
    val df = Seq(
      // g1: y = 2x exactly → slope_ppm = 2_000_000
      ("g1", 0L, 0L), ("g1", 1L, 2L), ("g1", 2L, 4L),
      // g2: y = 4−2x → −2_000_000 (negative truncation path)
      ("g2", 0L, 4L), ("g2", 1L, 2L), ("g2", 2L, 0L),
      // g3: (0,0),(1,0),(2,1): num=3, den=6 → 500_000 (non-integer slope)
      ("g3", 0L, 0L), ("g3", 1L, 0L), ("g3", 2L, 1L),
      // g4: all x equal → zero variance → NULL
      ("g4", 5L, 1L), ("g4", 5L, 9L)
    ).toDF("g", "x", "y")
    val got = Trend.groupedTrend(df, Seq("g"), col("x"), col("y"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
    assert(got("g1") == ((3L, Some(2000000L))))
    assert(got("g2") == ((3L, Some(-2000000L))))
    assert(got("g3") == ((3L, Some(500000L))))
    assert(got("g4") == ((2L, None)))
  }

  test("theilSenTrend: exact pairwise-slope median, grid collapse, <2-point groups absent") {
    import spark.implicits._
    val df = Seq(
      // g1: grid (0,0),(1,2),(2,4) → slopes {2,2,2}·1e6, median 2_000_000
      ("g1", 0L, 0L), ("g1", 1L, 2L), ("g1", 2L, 4L),
      // g2: (0,0),(1,1),(2,10) → slopes {1e6, 9e6, 5e6}; median = 5_000_000
      ("g2", 0L, 0L), ("g2", 1L, 1L), ("g2", 2L, 10L),
      // g3: repeated x rows must SUM on the grid first: x=0 has 1+2=3,
      // x=1 has 4 → one pair, slope 1_000_000
      ("g3", 0L, 1L), ("g3", 0L, 2L), ("g3", 1L, 4L),
      // g4: negative slope, truncation toward zero: (0,1),(3,-1) →
      // dy=-2, -((2*1e6) div 3) = -666_666 (floor would give -666_667)
      ("g4", 0L, 1L), ("g4", 3L, -1L),
      // g5: single grid point → no pairs → absent
      ("g5", 7L, 3L)
    ).toDF("g", "x", "y")
    val got = Trend.theilSenTrend(df, Seq("g"), col("x"), col("y"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("g1") == ((3L, 2000000L)))
    assert(got("g2") == ((3L, 5000000L)))
    assert(got("g3") == ((1L, 1000000L)))
    assert(got("g4") == ((1L, -666666L)))
    assert(!got.contains("g5"))
  }

  test("theilSenTrend even pair count: LOWER middle, not the average of the two middles") {
    import spark.implicits._
    // 4 grid points → C(4,2) = 6 pairs (even). Slopes ·1e6 sorted:
    // (0,0)-(1,1):1, (0,0)-(2,8):4, (0,0)-(3,9):3, (1,1)-(2,8):7,
    // (1,1)-(3,9):4, (2,8)-(3,9):1 → {1,1,3,4,4,7}; the two middles are
    // 3 and 4. The documented convention ((cnt+1) div 2 = rn 3) picks the
    // LOWER middle 3_000_000 — "median of slopes" as the average of the
    // middles (3_500_000) would be a different operator.
    val df = Seq(("e", 0L, 0L), ("e", 1L, 1L), ("e", 2L, 8L), ("e", 3L, 9L))
      .toDF("g", "x", "y")
    val got = Trend.theilSenTrend(df, Seq("g"), col("x"), col("y")).head()
    assert(got.getLong(1) == 6L)
    assert(got.getLong(2) == 3000000L)
  }

  test("ewmaIntSeries: hand-traced integer recurrence with sign-split truncation") {
    import spark.implicits._
    // α = 1/4: s₀ = 4; s₁ = ±(|−20 + 3·4| div 4) = −(8 div 4) = −2;
    // s₂ = (8 + 3·(−2)) div 4 = 2 div 4 = 0 (truncation toward zero —
    // floor would be identical here, but s₁ pins the negative branch where
    // they differ: floor(−8/4) = −2 = trunc, use −9: trunc −2 vs floor −3)
    val df = Seq(("g", 0L, 4L), ("g", 1L, -20L), ("g", 2L, 8L),
      // h: repeated x must grid-sum first (3+1=4), then s₁ = (−9+12) div 4 = 0
      ("h", 0L, 3L), ("h", 0L, 1L), ("h", 1L, -9L))
      .toDF("g", "x", "y")
    val got = graft.operators.Trend
      .ewmaIntSeries(df, Seq("g"), col("x"), col("y"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(got == Map(("g", 0L) -> 4L, ("g", 1L) -> -2L, ("g", 2L) -> 0L,
      ("h", 0L) -> 4L, ("h", 1L) -> 0L))
  }

  test("holtIntSeries: random series match the Scala recurrence; EWMA lags a ramp, Holt doesn't") {
    import spark.implicits._
    val rng = new scala.util.Random(37)
    val rows = for (g <- Seq("a", "b"); x <- 0L until 25L)
      yield (g, x, rng.nextInt(4000000).toLong - 1500000L)
    val got = graft.operators.Trend
      .holtIntSeries(rows.toDF("g", "x", "y"), Seq("g"), col("x"), col("y"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(3), r.getLong(4))))
      .toMap
    def tdiv(v: Long, d: Long): Long = (if (v < 0) -1L else 1L) * (math.abs(v) / d)
    rows.groupBy(_._1).foreach { case (g, rs) =>
      var l = 0L; var b = 0L; var first = true
      rs.sortBy(_._2).foreach { case (_, x, y) =>
        if (first) { l = y; b = 0L; first = false }
        else {
          val l2 = tdiv(y + 3 * (l + b), 4)
          b = tdiv((l2 - l) + b, 2)
          l = l2
        }
        assert(got((g, x)) == ((l, b)), s"($g, $x)")
      }
    }
    // the design point: on a clean ramp y = 100·x, EWMA's level lags far
    // behind while Holt's level + trend tracks the ramp closely
    val ramp = (0L until 40L).map(x => ("r", x, 100L * x))
    val holtLast = graft.operators.Trend
      .holtIntSeries(ramp.toDF("g", "x", "y"), Seq("g"), col("x"), col("y"))
      .filter(col("x") === 39L).head()
    val ewmaLast = graft.operators.Trend
      .ewmaIntSeries(ramp.toDF("g", "x", "y"), Seq("g"), col("x"), col("y"))
      .filter(col("x") === 39L).head()
    val target = 3900L
    assert(math.abs(holtLast.getLong(3) - target) * 3 <
      math.abs(ewmaLast.getLong(3) - target),
      s"Holt ${holtLast.getLong(3)} should track $target far better than " +
        s"EWMA ${ewmaLast.getLong(3)}")
  }

  test("theilSenTrend shrugs off the outlier day that drags OLS") {
    import spark.implicits._
    // y = x on days 0..20, except the LAST day reports 10_000 (a bad
    // backfill at the edge, where OLS leverage is maximal — a center
    // outlier has x−x̄ = 0 and would not move the OLS slope at all)
    val rows = (0L to 20L).map(x => ("m", x, if (x == 20) 10000L else x))
    val df = rows.toDF("g", "x", "y")
    val ts = Trend.theilSenTrend(df, Seq("g"), col("x"), col("y"))
      .head().getLong(2)
    val ols = Trend.groupedTrend(df, Seq("g"), col("x"), col("y"))
      .head().getLong(2)
    // the true slope is 1e6; one corrupted day of 21 must not move the
    // median-of-slopes beyond the truncation granularity…
    assert(math.abs(ts - 1000000L) <= 1,
      s"Theil–Sen moved to $ts under one outlier")
    // …while OLS gets dragged by orders of magnitude
    assert(math.abs(ols - 1000000L) > 100000L,
      s"control failed: OLS at $ols barely moved — outlier too weak")
  }

  test("groupedTrend is partitioning-invariant (decimal sums commute)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 500).map(i =>
      ("g" + (i % 3), rnd.nextInt(1000000).toLong, rnd.nextInt(2000000).toLong - 1000000L))
    val a = Trend.groupedTrend(rows.toDF("g", "x", "y").repartition(1),
      Seq("g"), col("x"), col("y")).collect().map(_.toSeq).toSet
    val b = Trend.groupedTrend(rows.toDF("g", "x", "y").repartition(13),
      Seq("g"), col("x"), col("y")).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("ksPairwise: hand case D=1/4, disjoint supports D=1, symmetric pairs once") {
    import spark.implicits._
    val df = (Seq.fill(1)(("a", 1L)) ++ Seq(("a", 2L), ("a", 3L), ("a", 4L)) ++
      Seq(("b", 2L), ("b", 4L)) ++ Seq(("c", 9L), ("c", 10L))).toDF("src", "v")
    val got = RobustStats.ksPairwise(df, "src", "v")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // a=[1,2,3,4] vs b=[2,4]: max gap at v=1 or 3: |1·2−0·4|=2 → 2e6/8
    assert(got(("a", "b")) == ((4L, 2L, 250000L)))
    // c's support is disjoint and above both → D = 1
    assert(got(("a", "c")) == ((4L, 2L, 1000000L)))
    assert(got(("b", "c")) == ((2L, 2L, 1000000L)))
    assert(got.size == 3) // each unordered pair exactly once
  }

  test("ksPairwise: randomized equivalence with the brute-force ECDF max gap") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val rows = (1 to 400).map(_ => (s"s${rnd.nextInt(4)}", rnd.nextInt(25).toLong))
    val byG = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def brute(a: Seq[Long], b: Seq[Long]): Long = {
      val vs = (a ++ b).distinct.sorted
      val num = vs.map(v =>
        math.abs(a.count(_ <= v).toLong * b.size - b.count(_ <= v).toLong * a.size)).max
      num * 1000000L / (a.size.toLong * b.size)
    }
    val want = (for {
      ga <- byG.keys; gb <- byG.keys if ga < gb
    } yield (ga, gb) -> brute(byG(ga), byG(gb))).toMap
    val got = graft.operators.RobustStats.ksPairwise(
      rows.toDF("src", "v").repartition(7), "src", "v")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    assert(got == want)
  }

  test("ksPairwise: identical distributions → 0 ppm") {
    import spark.implicits._
    val df = (1 to 50).flatMap(i => Seq(("p", i.toLong), ("q", i.toLong)))
      .toDF("src", "v")
    val got = RobustStats.ksPairwise(df, "src", "v").collect()
    assert(got.length == 1 && got.head.getLong(4) == 0L)
  }

  test("hllRegisters matches a driver-side md5 replay; estimate is sane and invariant") {
    import spark.implicits._
    val values = (1 to 500).map(_.toString)
    // driver-side replay of the exact register rule
    def h48(v: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(v.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 12), 16)
    }
    val want = values.map(h48).groupBy(_ >> 42).map { case (b, hs) =>
      b -> hs.map { h =>
        val sfx = h & ((1L << 42) - 1)
        if (sfx == 0) 43L else 43L - java.lang.Long.toBinaryString(sfx).length
      }.max
    }
    for (parts <- Seq(1, 11)) {
      val df = values.map(v => ("g", v)).toDF("g", "v").repartition(parts)
      val got = HllOps.hllRegisters(df, Seq("g"), "v", p = 6)
        .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
      assert(got == want, s"register divergence at $parts partitions")
    }
    val est = HllOps.hllEstimate(values.map(v => ("g", v)).toDF("g", "v"),
      Seq("g"), "v", p = 6).select("est_distinct").head().getLong(0)
    // m=64 raw HLL: ~13% relative error envelope; 3σ bound
    assert(est > 250 && est < 1000, s"estimate $est implausible for 500 distinct")
  }

  test("hllSetEstimates: identical groups fully intersect, disjoint groups don't") {
    import spark.implicits._
    val a = (1 to 400).map(i => ("a", i.toString))
    val b = (1 to 400).map(i => ("b", i.toString)) // identical value set
    val c = (1001 to 1400).map(i => ("c", i.toString)) // disjoint
    val got = HllOps.hllSetEstimates((a ++ b ++ c).toDF("g", "v"), "g", "v", p = 6)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val (ea, eb, uAb, iAb) = got(("a", "b"))
    // identical sets: union registers = either side's → est_union = est_a,
    // inclusion–exclusion gives intersect = est exactly
    assert(ea == eb && uAb == ea && iAb == ea, s"identical-set algebra broke: $got")
    val (_, _, uAc, iAc) = got(("a", "c"))
    // disjoint ~800 distinct: union within the m=64 3σ envelope, and the
    // intersect estimate is small relative to the union
    assert(math.abs(uAc - 800.0) / 800.0 <= 3.0 * 1.04 / math.sqrt(64.0),
      s"disjoint union estimate off: $uAc")
    assert(iAc <= uAc / 3, s"disjoint intersect too large: $iAc vs union $uAc")
  }

  test("hllEstimate: duplicates don't move the registers") {
    import spark.implicits._
    val once = (1 to 200).map(i => ("g", i.toString))
    val thrice = once ++ once ++ once
    val a = HllOps.hllEstimate(once.toDF("g", "v"), Seq("g"), "v", 6)
      .select("denom_q", "est_distinct").head()
    val b = HllOps.hllEstimate(thrice.toDF("g", "v"), Seq("g"), "v", 6)
      .select("denom_q", "est_distinct").head()
    assert(a == b)
  }
}
