package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.sketch.KmvOps

/** Property pin for the KMV estimator's error envelope: the relative error
  * of `(k-1)·M div h_k` has standard deviation ≈ 1/√(k−2) (Bar-Yossef et
  * al.), so any estimate outside 3σ of truth flags a broken hash or
  * estimator edit. Seeded: a statistical bound must be deterministic to be
  * a gate (the envelope leaves slack — observed errors sit well inside it —
  * but a fresh random seed per run would still make rare 3σ excursions a
  * flake source). Small groups (< k distinct) must be EXACT. */
class KmvPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val genCase: Gen[(Long, Seq[(String, Int)], Int)] = for {
    salt <- Gen.choose(0L, 1000000000L) // varies the hashed value universe
    k <- Gen.oneOf(8, 16, 32, 64)
    ns <- Gen.listOfN(3, Gen.choose(1, 4000))
  } yield (salt, ns.zipWithIndex.map { case (n, j) => (s"g$j", n) }, k)

  test("KMV estimate stays inside the 3-sigma relative-error envelope (property)") {
    import spark.implicits._
    val prop = Prop.forAll(genCase) { case (salt, groups, k) =>
      val rows = groups.flatMap { case (g, n) =>
        (0 until n).map(i => (g, s"${salt}_${g}_$i"))
      }
      val got = KmvOps.kmvDistinct(rows.toDF("g", "v"), Seq("g"), "v", k)
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3)))).toMap
      groups.forall { case (g, n) =>
        val (nSample, est) = got(g)
        if (n < k) {
          assert(nSample == n && est == n,
            s"group $g: sub-k group must report exactly: n=$n sample=$nSample est=$est")
        } else {
          assert(nSample == k, s"group $g: expected a full k-sample, got $nSample")
          val sigma = 1.0 / math.sqrt(k - 2.0)
          val relErr = math.abs(est.toDouble / n - 1.0)
          assert(relErr <= 3 * sigma,
            s"group $g: k=$k n=$n est=$est relErr=$relErr > 3σ=${3 * sigma}")
        }
        true
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20)
        .withInitialSeed(Seed(20260814L)), prop)
    assert(res.passed, res.status.toString)
  }

  test("set estimates: identical groups intersect fully, disjoint groups at zero") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val rows =
      (1 to 500).map(i => ("a", s"v$i")) ++
        (1 to 500).map(i => ("b", s"v$i")) ++        // b == a
        (1 to 500).map(i => ("c", s"w$i"))           // c disjoint from both
    val sk = KmvOps.kmvSketch(rows.toDF("g", "v"), Seq("g"), "v", k = 16)
    val est = KmvOps.kmvSetEstimates(sk, "g", "kmv_sketch", k = 16)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val (sharedAb, unionAb, interAb) = est(("a", "b"))
    assert(sharedAb == 16L && interAb == unionAb,
      s"identical sets must fully intersect: $est")
    val (sharedAc, _, interAc) = est(("a", "c"))
    assert(sharedAc == 0L && interAc == 0L, s"disjoint sets must not intersect: $est")
    // union of disjoint ~1000 distinct: estimator within the 3σ envelope
    val uAc = est(("a", "c"))._2
    assert(math.abs(uAc - 1000.0) / 1000.0 <= 3.0 / math.sqrt(14.0),
      s"disjoint union estimate off: $uAc")
  }

  test("rolling re-aggregation: merged bucket sketches equal the window's own sketch") {
    import spark.implicits._
    val rnd = new scala.util.Random(37)
    // values overlap across buckets so the merge genuinely dedupes
    val rows = (1 to 600).map(_ =>
      ("g" + rnd.nextInt(2), rnd.nextInt(10).toLong, rnd.nextInt(120).toLong))
    val df = rows.toDF("g", "b", "v")
    val got = KmvOps.kmvRollingDistinct(
      df, Seq("g"), "v", bucket = org.apache.spark.sql.functions.col("b"),
      windowBuckets = 3, k = 8)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // ground truth: for each observed (g, b), sketch the window's raw rows
    val observed = rows.map(t => (t._1, t._2)).distinct
    observed.foreach { case (g, b) =>
      val windowRows = rows.filter(t => t._1 == g && t._2 >= b - 2 && t._2 <= b)
        .map(t => (g, t._3))
      val direct = KmvOps.kmvDistinct(
        windowRows.toDF("g", "v"), Seq("g"), "v", k = 8)
        .head()
      assert(got((g, b)) == ((direct.getLong(1), direct.getLong(2),
        direct.getLong(3))), s"window ($g, $b) diverges")
    }
  }
}
