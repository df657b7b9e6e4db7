package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding storage quantization: symmetric per-vector int8 — a float32
  * embedding column shrinks 4× (plus the one double scale per vector),
  * which at 100 TB is the difference between an ANN index that fits on
  * the cluster and one that doesn't.
  *
  * Codes are `floor(x / maxAbs * 127)` with a per-vector `maxAbs` scale:
  * every step is elementwise IEEE arithmetic in a fixed expression shape,
  * so the codes are deterministic and exactly replayable in SQL (no
  * rounding-mode ambiguity — `floor`, not round-half-X, which differs
  * between engines). A zero vector gets scale 0 and all-zero codes.
  * Dequantization is `code * maxAbs / 127` (approximate by design;
  * max quantization error per component is maxAbs/127).
  *
  * Shuffle-free narrow map; codegen'd higher-order functions only. */
object Quantize {

  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String,
      keepCols: Seq[String] = Nil): DataFrame = {
    val v = transform(col(vecCol), x => x.cast("double"))
    val mx = array_max(transform(v, x => abs(x)))
    val codes = when(mx === 0.0,
        transform(v, _ => lit(0L)))
      .otherwise(transform(v, x => floor(x / mx * 127.0)))
    df.select(col(idCol) +: keepCols.map(col) :+ codes.as("codes")
      :+ mx.as("scale"): _*)
  }

  /** Approximate reconstruction from [[quantizeInt8]] output. */
  def dequantizeInt8(df: DataFrame, codesCol: String, scaleCol: String): DataFrame =
    df.withColumn("vec_approx",
      transform(col(codesCol), c => c.cast("double") * col(scaleCol) / 127.0))

  /** Deterministic ±1 sign matrix for [[signProject]]: entry (j, i) from a
    * splitmix64-style avalanche of `(seed, j·dim + i)`. Pure Scala — the
    * SQL-oracle generator calls the same function, so the Spark expression
    * and the replay SQL embed identical literals. */
  def signMatrix(outDim: Int, dim: Int, seed: Long): Seq[Seq[Int]] = {
    def mix(x0: Long): Long = {
      var x = x0 + 0x9e3779b97f4a7c15L
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      x ^ (x >>> 31)
    }
    Seq.tabulate(outDim, dim)((j, i) =>
      if ((mix(seed * 0x100000001b3L + j.toLong * dim + i) & 1L) == 0L) 1 else -1)
  }

  /** Random sign projection (Achlioptas-style ±1 Johnson–Lindenstrauss)
    * over the int8-quantized codes: `p_j = Σ_i s_{ji}·code_i` for a
    * deterministic ±1 [[signMatrix]]. The compact distance-preserving
    * sketch for shard-level pre-filtering — `outDim` longs per vector
    * instead of `dim` floats, and because the inputs are the integer
    * codes, the projection is exact integer arithmetic: bit-identical on
    * any engine, any summation order (the float-projection variant would
    * hash-mismatch on accumulation order alone).
    *
    * '''Plan shape (the 100-TB design).''' The sign matrix is a model
    * parameter baked into the expression (outDim·dim literal signs — KB),
    * so the whole operator is one shuffle-free narrow map over the
    * vectors, codegen'd adds of `element_at` terms. */
  def signProject(
      df: DataFrame, idCol: String, vecCol: String,
      outDim: Int = 8, dim: Int = 64, seed: Long = 42L,
      keepCols: Seq[String] = Nil): DataFrame = {
    val signs = signMatrix(outDim, dim, seed)
    val q0 = quantizeInt8(df, idCol, vecCol, keepCols)
    // a vector shorter than `dim` would make element_at return NULL under
    // non-ANSI SQL and every projection silently all-NULL — fail loudly on
    // the first mismatched row instead
    val q = q0.withColumn("codes",
      when(size(col("codes")) === dim, col("codes"))
        .otherwise(raise_error(concat(
          lit("signProject: vector length "),
          size(col("codes")).cast("string"),
          lit(s" != dim=$dim")))))
    val projections = (0 until outDim).map { j =>
      (0 until dim).map { i =>
        val term = element_at(col("codes"), i + 1)
        if (signs(j)(i) > 0) term else -term
      }.reduce(_ + _).as(s"p$j")
    }
    q.select(col(idCol) +: keepCols.map(col) :++ projections: _*)
  }

  private def groupDimSums(
      df: DataFrame, groupCol: String, vecCol: String, tag: String): DataFrame = {
    val v = transform(col(vecCol), x => x.cast("double"))
    val mx = array_max(transform(v, x => abs(x)))
    val codes = when(mx === 0.0, transform(v, _ => lit(0L)))
      .otherwise(transform(v, x => floor(x / mx * 127.0)))
    df.select(col(groupCol).as("__g"), codes.as("__c"))
      .select(col("__g"), posexplode(col("__c")))
      .groupBy(col("__g"), col("pos"))
      .agg(sum("col").as(s"__sum_$tag"), count(lit(1)).as(s"__n_$tag"))
  }

  /** Integer-exact embedding DRIFT report between two snapshots: per
    * group (label/source/cluster), how far the mean embedding moved —
    * the data/model drift monitor a production retrieval or curation
    * pipeline runs between corpus refreshes before trusting yesterday's
    * centroids, thresholds, or ANN index on today's data.
    *
    * Both snapshots are int8-quantized ([[quantizeInt8]]'s exact floor
    * codes) and each group's per-dimension mean is computed in FIXED-POINT:
    * `m = ((Σcode + 127·n) · ppm) div n` — the `127·n` shift makes the
    * numerator non-negative, so truncating (Spark `div`) and flooring
    * (DuckDB `//`) integer division agree, and no cross-multiplied
    * `Σ·n` product ever forms (a `sum_a·n_b` comparison overflows int64
    * near 10⁹-row snapshots; dividing first is overflow-free at ANY
    * corpus size). Drift per group = L1 and max over dimensions of
    * `|m_a − m_b|`, in ppm-of-code units — pure integers, engine-exact.
    *
    * '''Plan shape (the 100-TB design).''' One pass per snapshot:
    * posexplode to (group, dim) grain, map-side-combined sums — the
    * exchange ships #groups·dim aggregate rows, never vectors. The
    * snapshot join is (group, dim)-grain equi-join on model-scale rows.
    * Groups present in only one snapshot are dropped (drift is defined
    * on common groups; diff membership separately with
    * [[graft.llm.CorpusDiff]]). */
  def embeddingDrift(
      a: DataFrame, b: DataFrame, groupCol: String, vecCol: String,
      ppm: Long = 1000000L): DataFrame = {
    require(ppm > 0, "ppm scale must be positive")
    val sa = groupDimSums(a, groupCol, vecCol, "a")
    val sb = groupDimSums(b, groupCol, vecCol, "b")
    def m(tag: String) = expr(
      s"((__sum_$tag + 127L * __n_$tag) * ${ppm}L) div __n_$tag")
    sa.join(sb, Seq("__g", "pos"))
      .select(col("__g"), col("__n_a"), col("__n_b"),
        abs(m("a") - m("b")).as("__d"))
      .groupBy(col("__g").as(groupCol))
      .agg(max("__n_a").cast("long").as("n_a"),
        max("__n_b").cast("long").as("n_b"),
        sum("__d").cast("long").as("drift_l1"),
        max("__d").cast("long").as("drift_max"))
  }

  /** Quantized Gram/second-moment matrix of the embedding corpus:
    * `(i, j, qsum, n)` rows over the 1-based upper triangle, where
    * `qsum = Σ floor(v_i·v_j·2²⁴)` — the covariance/whitening/PCA audit
    * input, computed by [[graft.functions.GramMatrixAgg]] in one
    * bounded-state pass (never a d²-fold row explode; see its scaladoc).
    * `n` counts the non-null vectors that entered the sum. */
  def gramMatrix(df: DataFrame, vecCol: String, dim: Int): DataFrame =
    df.select(col(vecCol).cast("array<double>").as("__v"))
      .agg(graft.functions.GramMatrixAgg.gramMatrix(col("__v"), dim).as("__g"),
        count(col("__v")).as("n"))
      .select(explode(col("__g")).as("__e"), col("n"))
      .select(col("__e.i").as("i"), col("__e.j").as("j"),
        col("__e.qsum").as("qsum"), col("n"))

  /** Pairwise group-centroid similarity in exact integers — do two labels'
    * embedding clouds point the same way (label noise / near-synonym
    * classes), or is a source's embedding distribution drifting from
    * another's? Per group, the TRUNCATED integer mean vector
    * `m_i = (Σ floor(x_i·2¹²)) div n` (each |m_i| ≤ 4096 by construction,
    * however many rows — the scale-safety trick); per group pair (a < b),
    * the exact longs `dot_q = Σ mₐᵢ·m_bᵢ`, `norm_a_q = Σ mₐᵢ²`,
    * `norm_b_q = Σ m_bᵢ²`, and the signed squared cosine
    * `cos_sq_ppm = sign(dot) · (dot²·10⁶) div (norm_a·norm_b)` (the
    * square avoids sqrt; the sign restores direction — ±10⁶ = parallel,
    * 0 = orthogonal). dot² runs in decimal(38,0); with |m_i| ≤ 4096 and
    * d ≤ 4096 dims every quantity is bounded INDEPENDENT of corpus size.
    *
    * '''Plan shape (the 100-TB design).''' One posexplode + map-side-
    * combined aggregate collapses the corpus to the (groups × dims) grid;
    * the pair join and epilogue run on that grid only. Groups must be
    * modest in number (the output is group-pair grain) — that's the
    * operator's domain: labels, sources, shards. */
  def centroidSimilarity(df: DataFrame, groupCol: String, vecCol: String)
      : DataFrame = {
    val q = df.select(col(groupCol).as("__g"),
      posexplode(col(vecCol).cast("array<double>")).as(Seq("__i", "__x")))
      .withColumn("__q", expr("cast(floor(__x * 4096.0) as long)"))
      .groupBy("__g", "__i")
      .agg(sum("__q").as("__s"), count(lit(1)).as("__n"))
      .withColumn("__m", expr(
        "CASE WHEN __s >= 0 THEN __s div __n ELSE -((-__s) div __n) END"))
      .select("__g", "__i", "__m", "__n")
    val a = q.select(col("__g").as("label_a"), col("__i"),
      col("__m").as("__ma"), col("__n").as("n_a"))
    val b = q.select(col("__g").as("label_b"), col("__i"),
      col("__m").as("__mb"), col("__n").as("n_b"))
    a.join(b, Seq("__i"))
      .filter(col("label_a") < col("label_b"))
      .groupBy("label_a", "label_b")
      .agg(max("n_a").as("n_a"), max("n_b").as("n_b"),
        sum(expr("__ma * __mb")).as("dot_q"),
        sum(expr("__ma * __ma")).as("norm_a_q"),
        sum(expr("__mb * __mb")).as("norm_b_q"))
      .withColumn("cos_sq_ppm",
        when(col("norm_a_q") === 0L || col("norm_b_q") === 0L,
          lit(null).cast("long"))
          .otherwise(expr(
            "cast(CASE WHEN dot_q >= 0 THEN 1 ELSE -1 END *" +
              " ((cast(dot_q as decimal(38,0)) * dot_q * 1000000) div" +
              " (cast(norm_a_q as decimal(38,0)) * norm_b_q)) as bigint)")))
  }
}
