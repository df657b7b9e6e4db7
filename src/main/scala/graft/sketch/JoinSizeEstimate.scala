package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based join-cardinality estimation: predict `|A ⋈ B|` on an
  * equi-key from two tiny Count-Min sketches instead of running the join.
  *
  * The estimator is the classic CM inner product (Cormode & Muthukrishnan,
  * "An improved data stream summary: the count-min sketch and its
  * applications", J. Algorithms 55(1), §4.2): per depth row `i`,
  * `est_i = Σ_j A_i[j]·B_i[j]` overestimates the true join size
  * `Σ_k n_A(k)·n_B(k)` by hash collisions only, so the estimate is
  * `min_i est_i` — always an upper bound, within `ε·|A|·|B|` of truth with
  * high probability (`ε ≈ e/width`).
  *
  * Why it earns a place at 100 TB: the sketches are `depth × width` counters
  * built by one map-side-combinable aggregate per side — a few hundred KB of
  * shuffle regardless of input size — so a planner can know whether a join's
  * OUTPUT will be 10× its inputs (a key-multiplicity blowup) before paying
  * for the join's full shuffle. The skew-join family in this repo decides
  * HOW to join; this estimates WHETHER the join is affordable at all.
  *
  * Unlike [[CmsOps]] (which wraps Spark's binary `CountMinSketch` for
  * reference parity), the hash here is plain integer arithmetic —
  * `((key mod M)·a_i + b_i) mod M mod width` with `M = 2³¹−1` — so any SQL
  * engine replays the whole estimator bit-exactly; the `join_size_cms`
  * oracle does exactly that. All intermediates fit in a signed 64-bit
  * integer: `(key mod M)·a_i + b_i < 2³¹·2³¹ + 2³¹ < 2⁶³`.
  */
object JoinSizeEstimate {

  val Modulus: Long = 2147483647L // 2^31 − 1, prime

  private def splitmix(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Per-depth `(a_i, b_i)` pairwise-ish hash coefficients, derived
    * deterministically from the seed (`a_i ∈ [1, M)`, `b_i ∈ [0, M)`).
    * Public so the oracle SQL is generated from the SAME constants. */
  def coefficients(depth: Int, seed: Long): Seq[(Long, Long)] =
    (0 until depth).map { i =>
      val a = 1L + java.lang.Long.remainderUnsigned(splitmix(seed + 2L * i), Modulus - 1)
      val b = java.lang.Long.remainderUnsigned(splitmix(seed + 2L * i + 1), Modulus)
      (a, b)
    }

  private def bucketCol(key: Column, a: Long, b: Long, width: Int): Column =
    (pmod(key.cast("long"), lit(Modulus)) * lit(a) + lit(b)) % lit(Modulus) % lit(width)

  /** The `depth × width` counter table of one side: rows
    * `(depth_i, bucket, cnt)`. One aggregate job; the partial aggregate
    * combines map-side, so the shuffle carries at most
    * `depth · width · numPartitions` rows no matter the input size. */
  def sketchCounts(df: DataFrame, keyCol: String,
      depth: Int, width: Int, seed: Long): DataFrame = {
    require(depth >= 1 && width >= 2, s"need depth>=1, width>=2; got $depth, $width")
    val coeffs = coefficients(depth, seed)
    val buckets = array(coeffs.map { case (a, b) =>
      bucketCol(col(keyCol), a, b, width)
    }: _*)
    df.select(posexplode(buckets).as(Seq("depth_i", "bucket")))
      .groupBy("depth_i", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Per-depth inner products `(depth_i, inner_product)` — each an
    * independent overestimate of the true join size. The join is on
    * `(depth_i, bucket)` over two `depth·width`-row tables: constant-size
    * work however large the inputs. */
  def innerProducts(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String,
      depth: Int = 5, width: Int = 65536, seed: Long = 42L): DataFrame = {
    val l = sketchCounts(left, leftKey, depth, width, seed)
      .withColumnRenamed("cnt", "lcnt")
    val r = sketchCounts(right, rightKey, depth, width, seed)
      .withColumnRenamed("cnt", "rcnt")
    l.join(r, Seq("depth_i", "bucket"))
      .groupBy("depth_i")
      .agg(sum(col("lcnt") * col("rcnt")).as("inner_product"))
  }

  /** The estimate: `min_i est_i`, one row `(est_join_size)`. Always an
    * upper bound on `|left ⋈ right|` for the given equi-key. */
  def estimate(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String,
      depth: Int = 5, width: Int = 65536, seed: Long = 42L): DataFrame =
    innerProducts(left, leftKey, right, rightKey, depth, width, seed)
      .agg(min("inner_product").as("est_join_size"))

  /** Oracle-side replay: ANSI SQL computing the same estimate from the same
    * constants (table/key names interpolated by the caller). Kept next to
    * the Spark implementation so the two can never drift. */
  def oracleSql(leftTable: String, leftKey: String,
      rightTable: String, rightKey: String,
      depth: Int = 5, width: Int = 65536, seed: Long = 42L): String = {
    val coeffs = coefficients(depth, seed)
    def side(alias: String, table: String, key: String): String = {
      val arms = coeffs.zipWithIndex.map { case ((a, b), i) =>
        s"SELECT $i AS depth_i, ((($key % ${Modulus} + ${Modulus}) % ${Modulus}) * $a + $b) % ${Modulus} % $width AS bucket FROM $table"
      }.mkString(" UNION ALL ")
      s"$alias AS (SELECT depth_i, bucket, count(*) AS cnt FROM ($arms) GROUP BY 1, 2)"
    }
    s"""WITH ${side("ls", leftTable, leftKey)},
       |${side("rs", rightTable, rightKey)},
       |ip AS (SELECT ls.depth_i, sum(ls.cnt * rs.cnt)::BIGINT AS inner_product
       |  FROM ls JOIN rs ON ls.depth_i = rs.depth_i AND ls.bucket = rs.bucket
       |  GROUP BY 1)
       |SELECT min(inner_product) AS est_join_size FROM ip""".stripMargin
  }
}
