package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data pipelines.
  *
  * `df.sample()` / `sampleBy()` draw from per-partition RNG streams, so the
  * selected row SET changes with partitioning, task retries, and cluster
  * size — unacceptable for a 100-TB corpus that must be re-materializable
  * (ablations, incremental reruns, lineage audits). Hash-based sampling
  * decides membership from the row's own id: reproducible anywhere,
  * join-stable across tables sharing the id, and exactly replayable by a
  * SQL oracle. North-star extension surface (SURVEY.md §2.4 family).
  */
object Sampling {

  private val Buckets = 1000000L

  /** Portable per-id sampling hash in [0, 1e6): 60-bit md5 prefix of the
    * id string (+ salt), mod 1e6. Bit-identical in any engine with md5
    * (DuckDB: `('0x'||substr(md5(id||salt),1,15))::BIGINT % 1000000`). */
  def sampleBucket(id: Column, salt: String = ""): Column =
    Dedup.portableTokenHash(concat(id.cast("string"), lit(salt))) % Buckets

  /** Uniform deterministic sample: keeps a row iff its id hashes below
    * `fraction`. The same (id, salt) always lands on the same side. */
  def sampleByHash(df: DataFrame, idCol: String, fraction: Double,
      salt: String = ""): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0,1]")
    df.filter(sampleBucket(col(idCol), salt) < lit((fraction * Buckets).toLong))
  }

  /** Deterministic weighted corpus mixture: sample each named corpus at its
    * own rate and union with a `corpus` provenance column — the "mix web at
    * 0.3, books at 1.0, code at 0.7" step that sets a training run's data
    * diet. Membership hashes (id, salt + corpusName), so each corpus draws
    * an independent, reproducible sample and the whole mixture is
    * re-materializable on any cluster — and exactly replayable by a SQL
    * oracle. Schemas must align by column name (`unionByName`). */
  def mixCorpora(
      corpora: Seq[(String, DataFrame, Double)],
      idCol: String,
      salt: String = ""): DataFrame = {
    require(corpora.nonEmpty, "mixCorpora requires at least one corpus")
    require(corpora.map(_._1).distinct.size == corpora.size,
      "corpus names must be distinct (they salt the sampling hash)")
    corpora.map { case (name, df, fraction) =>
      sampleByHash(df, idCol, fraction, salt + name).withColumn("corpus", lit(name))
    }.reduce(_ unionByName _)
  }

  /** Stratified deterministic sample: per-stratum fractions (e.g. language
    * rebalancing — downsample dominant languages, keep the tail), unmatched
    * strata fall back to `defaultFraction`. One codegen'd filter over the
    * scan — no shuffle, no RNG, pushdown-friendly. */
  def stratifiedSampleByHash(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 1.0,
      salt: String = ""): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction)).forall(f => f >= 0.0 && f <= 1.0),
      "fractions must be in [0,1]")
    val cut = fractions.toSeq.sortBy(_._1).foldLeft(
      lit((defaultFraction * Buckets).toLong)) { case (acc, (stratum, f)) =>
      when(col(strataCol) === stratum, lit((f * Buckets).toLong)).otherwise(acc)
    }
    df.filter(sampleBucket(col(idCol), salt) < cut)
  }

  /** Deterministic fractional-epoch resampling — the "web ×1.0, books
    * ×2.5, code ×0.3" multiplier step of a training-data recipe, where
    * weights may EXCEED 1 (upsampling by repetition): each row emits
    * `floor(w)` copies plus one more iff its id hash falls below the
    * fractional part, under an `epoch` column numbering the copies 0..k-1.
    * A weight of 2.5 repeats every doc twice and a reproducible hash-chosen
    * half a third time; a weight of 0.3 keeps a 30% sample at epoch 0 —
    * one operator covers both directions of [[mixCorpora]]'s dial.
    *
    * Scale shape: membership and copy count are pure functions of the id
    * (no RNG, no shuffle); the only data growth is the intended ×w explode,
    * emitted inside codegen. Unmatched weight keys fall back to
    * `defaultWeight`. Exactly SQL-replayable (generate_series + the same
    * md5 bucket). */
  def resampleByWeight(
      df: DataFrame,
      idCol: String,
      weightKeyCol: String,
      weights: Map[String, Double],
      defaultWeight: Double = 1.0,
      salt: String = ""): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(_ >= 0.0),
      "weights must be >= 0")
    val w = weights.toSeq.sortBy(_._1).foldLeft(lit(defaultWeight)) {
      case (acc, (k, v)) => when(col(weightKeyCol) === k, lit(v)).otherwise(acc)
    }
    // copies = floor(w) + (bucket < frac(w)·1e6): integer arithmetic on the
    // same hash bucket as every other sampler, so the fractional draw is
    // engine-portable and independent across salts
    val copies = (floor(w).cast("long") +
      when(sampleBucket(col(idCol), salt) <
        ((w - floor(w)) * Buckets).cast("long"), 1L).otherwise(0L)).as("__copies")
    df.withColumn("__copies", copies)
      .filter(col("__copies") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("__copies") - 1)))
      .drop("__copies")
  }

  /** Deterministic train/val/test split assignment: each row's split is a
    * pure function of its id hash, so splits are reproducible anywhere,
    * disjoint, exhaustive, and stable under corpus growth (an existing
    * row never changes split when new rows arrive — the property random
    * splitting lacks). Weights must sum to 1. */
  def assignSplit(
      df: DataFrame,
      idCol: String,
      splits: Seq[(String, Double)],
      salt: String = "",
      splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 >= 0.0),
      "split weights must be non-negative")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got ${splits.map(_._2).sum}")
    require(splits.map(_._1).distinct.size == splits.size,
      "split names must be unique")
    val b = sampleBucket(col(idCol), salt)
    val cutoffs = splits.scanLeft(0.0)(_ + _._2).tail
    val chain = splits.zip(cutoffs).init
      .foldRight(lit(splits.last._1): Column) { case (((name, _), cut), rest) =>
        when(b < lit((cut * Buckets).toLong), name).otherwise(rest)
      }
    df.withColumn(splitCol, chain)
  }

  /** LEAKAGE-SAFE split assignment: rows connected by `pairs` (e.g.
    * near-duplicate pairs from [[Dedup.minHashDedupPairs]]) always land in
    * the SAME split — the split key is the row's connected-component
    * representative (via [[graft.operators.ConnectedComponents]]), its own
    * id for singletons. Without this, a near-duplicate of a training
    * document sitting in the eval split silently inflates eval scores —
    * the train/test contamination the dedup pipeline exists to prevent. */
  def assignSplitByGroup(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      splits: Seq[(String, Double)],
      salt: String = "",
      splitCol: String = "split"): DataFrame = {
    val comps = graft.operators.ConnectedComponents.connectedComponents(pairs)
      .select(col("node").as("__graft_sn"), col("component").as("__graft_sc"))
    val keyed = df
      .join(comps, col(idCol) === col("__graft_sn"), "left")
      .withColumn("__graft_gkey", coalesce(col("__graft_sc"), col(idCol)))
    assignSplit(keyed, "__graft_gkey", splits, salt, splitCol)
      .drop("__graft_sn", "__graft_sc", "__graft_gkey")
  }

  /** Token-budget corpus selection: keep the best-scored documents until
    * the training budget fills — "take the highest-quality `budget` tokens"
    * — the step that turns a scored corpus into a training set.
    *
    * Selection rule: documents are ordered by (`scoreCol` DESC, `tieCol`
    * ASC — the deterministic total order), and a document is kept iff the
    * total weight of strictly-better documents is `< budget` (the document
    * crossing the boundary is kept; greedy prefix semantics). The rule is
    * a pure function of the data, so the selected SET is reproducible on
    * any cluster and exactly SQL-replayable.
    *
    * Scale shape — the naive formulation is `sum(w) OVER (ORDER BY score)`,
    * a single-task global window. This composes the two distributed
    * primitives instead: a [[graft.operators.GroupedRank]] global rank (no
    * single-task sort) followed by [[SequencePack]]'s two-phase prefix sum
    * over the dense rank space; "selected" is exactly SequencePack's chunk
    * 0. */
  def selectByTokenBudget(
      df: DataFrame,
      scoreCol: String,
      tieCol: String,
      weightCol: String,
      budget: Long): DataFrame = {
    val ranked = graft.operators.GroupedRank.withGroupRank(
      df, Seq(), Seq(col(scoreCol).desc, col(tieCol)), "__graft_qrank")
    SequencePack.packSequences(ranked, "__graft_qrank", weightCol, budget)
      .filter(col("chunk_id") === 0)
      .drop("chunk_id", "__graft_qrank")
  }

  /** Temperature-smoothed source sampling (the multilingual α-sampling
    * recipe, α = 1/2): each stratum's share of the `totalTarget` output is
    * proportional to `√n_s` instead of `n_s`, boosting tail
    * sources/languages at the dominant ones' expense — the standard fix
    * for head-language takeover when training on raw web proportions.
    *
    * Every step is engine-exact: the smoothed weight is `floor(sqrt(n_s))`
    * (IEEE sqrt is correctly rounded, so floor(sqrt) agrees bit-for-bit
    * across engines), the per-stratum quota is integer
    * `totalTarget·s_s div Σs_s`, and membership is the per-stratum
    * [[sampleBucket]] hash rank — reproducible on any cluster, exactly
    * SQL-replayable, join-stable. A stratum whose quota exceeds its size
    * contributes all its rows (rank can't exceed n_s).
    *
    * '''Plan shape (the 100-TB design).''' Stratum counts are one
    * map-side-combined aggregate (rows = #strata — KB-scale), the quota
    * table broadcast-joins back, and per-stratum ranking is a
    * [[graft.operators.GroupedRank]] — no single-task per-stratum sort
    * when one source dominates the corpus, which is precisely the
    * situation temperature sampling exists for. */
  def sampleByTemperature(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      totalTarget: Long,
      salt: String = ""): DataFrame = {
    require(totalTarget > 0, "totalTarget must be positive")
    val counts = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("__graft_n"))
      .withColumn("__graft_s", floor(sqrt(col("__graft_n"))))
    val tot = counts.agg(sum("__graft_s").as("__graft_tot"))
    val quotas = counts.crossJoin(broadcast(tot))
      .select(col(strataCol),
        expr(s"(${totalTarget}L * __graft_s) div __graft_tot").as("__graft_q"))
    val ranked = graft.operators.GroupedRank.withGroupRank(
      df.withColumn("__graft_hk", sampleBucket(col(idCol), salt)),
      Seq(strataCol), Seq(col("__graft_hk"), col(idCol)), "__graft_trank")
    // null-safe quota join (<=>, as GroupedRank ranks null groups): a NULL
    // stratum is a real stratum — its rows counted into __graft_tot above,
    // so a plain-equality join would silently drop them from the sample
    // while their weight still deflated every other stratum's quota
    val q = quotas.withColumnRenamed(strataCol, "__graft_strata")
    ranked
      .join(broadcast(q), col(strataCol) <=> col("__graft_strata"))
      .filter(col("__graft_trank") <= col("__graft_q"))
      .drop("__graft_hk", "__graft_trank", "__graft_q", "__graft_strata")
  }

  /** Deterministic weighted sampling without replacement, k rows per
    * stratum: priority sampling (Duffield–Lund–Thorup, JACM '07). Each row
    * gets priority `q = w / u` with `u` uniform on (0,1] derived from the
    * row's own id hash; the k highest-priority rows per stratum are the
    * sample. Inclusion probability is ∝ weight (length-/quality-weighted
    * corpus selection), yet membership is a pure function of
    * (id, weight, salt): reproducible on any cluster, join-stable, exactly
    * SQL-replayable — none of which holds for RNG-stream `sample()`.
    *
    * '''Determinism across engines.''' `u = (bucket+1)/1e6` and
    * `q = w·1e6/(bucket+1)`: the product is exact for integer weights up to
    * 2^33 (·1e6 stays under 2^53) and the one division is IEEE
    * correctly-rounded everywhere — no transcendentals (the classic
    * exponential-key formulation `u^(1/w)` needs `ln`, whose last ulp is
    * libm-dependent; priority sampling's `w/u` form avoids it).
    *
    * '''Plan shape (100-TB).''' Priorities are a narrow codegen'd map;
    * per-stratum top-k is a [[graft.operators.GroupedRank]] — no
    * single-task sort when one stratum dominates. Ties (equal priority)
    * break by id, so the sample is a total function of the inputs. */
  def samplePriority(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      weightCol: String,
      k: Int,
      salt: String = "",
      rankCol: String = "sample_rank"): DataFrame = {
    require(k > 0, "k must be positive")
    val pri = col(weightCol).cast("double") * lit(Buckets.toDouble) /
      (sampleBucket(col(idCol), salt) + lit(1L)).cast("double")
    val ranked = graft.operators.GroupedRank.withGroupRank(
      df.withColumn("__graft_pri", pri),
      Seq(strataCol), Seq(col("__graft_pri").desc, col(idCol)), rankCol)
    ranked.filter(col(rankCol) <= k).drop("__graft_pri")
  }

  /** Deterministic AT-MOST-k cap per group — "no more than k docs per
    * domain/source", the long-tail flattening step of a crawl-curation
    * recipe: keeps each group's k smallest rows under the portable
    * `(sampleBucket(id, salt), id)` order, i.e. a uniform reproducible
    * k-subsample of every oversized group, all of every smaller group.
    *
    * '''Plan shape (the 100-TB design).''' One bounded-state
    * [[graft.operators.GroupedTopK]] aggregate: ≤ k rows of partial state
    * per (group, map partition) through the single exchange — a hot
    * domain with 10⁹ pages ships k rows per map task, never the domain.
    * [[samplePriority]] (GroupedRank-based) ranks and ships EVERY row;
    * use it when weights matter, this when only the cap does. */
  def capPerGroup(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      k: Int,
      salt: String = "",
      rankCol: String = "sample_rank"): DataFrame =
    graft.operators.GroupedTopK.topKPerGroup(
      df, Seq(strataCol),
      Seq(sampleBucket(col(idCol), salt), col(idCol)), k, rankCol)

  /** Deterministic round-robin SOURCE INTERLEAVE: a total serving order in
    * which consecutive positions cycle through the sources —
    * `serving_pos = (rank_within_source − 1) · S + source_index`, with the
    * within-source rank a seeded hash shuffle. The training-loader shape
    * that stops a source-ordered corpus from putting a million docs of one
    * domain in a row (gradient batches see every source at every point of
    * the epoch), while staying a pure function of (id, salt): reproducible,
    * resumable at any position, exactly SQL-replayable.
    *
    * Rows whose `strataCol` is not in `sources` are dropped (the explicit
    * list fixes each source's residue class; pass every source for a full
    * epoch). Sources of unequal size leave gaps after the smaller sources
    * exhaust — positions stay a strict total order (serve in `serving_pos`
    * order; density is not part of the contract).
    *
    * '''Plan shape (the 100-TB design).''' One [[graft.operators.GroupedRank]]
    * pass (range partition + local ranks — no per-source single-task sort)
    * plus a narrow map; the source-index lookup is a literal map, no join. */
  def interleaveSources(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      sources: Seq[String],
      salt: String = ""): DataFrame = {
    require(sources.nonEmpty, "interleaveSources needs at least one source")
    require(sources.distinct.size == sources.size,
      "sources must be distinct (each fixes a residue class)")
    val sourceIdx = sources.zipWithIndex
      .foldLeft(lit(null).cast("long")) { case (acc, (s, i)) =>
        when(col(strataCol) === s, lit(i.toLong)).otherwise(acc)
      }
    val ranked = graft.operators.GroupedRank.withGroupRank(
      df.filter(col(strataCol).isInCollection(sources))
        .withColumn("__graft_hk", sampleBucket(col(idCol), salt)),
      Seq(strataCol), Seq(col("__graft_hk"), col(idCol)), "__graft_r")
    ranked
      .withColumn("serving_pos",
        (col("__graft_r") - 1) * sources.size + sourceIdx)
      .drop("__graft_hk", "__graft_r")
  }

  /** Max–min-fair per-group sampling quotas under a global row budget —
    * the "balanced corpus mix" allocator: find the largest common cap `c*`
    * with `Σ_g min(n_g, c*) ≤ B`, give every group `min(n_g, c*)`, and
    * hand the remaining `B − Σ min(n_g, c*)` rows one each to the first
    * still-capped groups in group-key order. Small groups keep everything;
    * big groups are flattened to the same ceiling — the water-filling
    * quota every "don't let CommonCrawl drown the mix" policy wants, made
    * exact and deterministic.
    *
    * All integer arithmetic on the #groups-grain counts frame: the cap
    * segment is found by sorting groups by count ascending and scanning
    * the piecewise-linear `total(c) = S_i + (G−i)·c` — prefix sums and a
    * max over G rows, no iteration, no bisection. If `Σ n_g ≤ B` every
    * group gets `n_g` (cap = max count, remainder 0 by construction).
    *
    * Output per group: `n`, `cap` (the common ceiling `c*`), `alloc`
    * (`min(n, c*)` plus any remainder bump). `Σ alloc = min(B, Σ n)`
    * exactly. Pair with [[capPerGroup]] (k = alloc_g) to materialize the
    * sample.
    *
    * '''Plan shape (100 TB).''' One corpus-scale `groupBy` count — the
    * only stage that scales with data. Everything after (sort, prefix
    * sums, the segment scan, the remainder ranks) runs on #groups rows:
    * windows with no partition key, fine at quota grain (sources/domains
    * number in the thousands, not billions). */
  def fairCaps(
      df: DataFrame,
      groupCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be non-negative: got $budget")
    val W = org.apache.spark.sql.expressions.Window
    // a NULL group key is an ordinary stratum (the sampling-family
    // convention, same as sampleByTemperature): rows without a source
    // still compete for budget — silently dropping them under-allocates
    // (r15 differential fuzz finding)
    val counts = df.groupBy(groupCol).agg(count(lit(1)).as("n"))
    val byN = W.orderBy(col("n"), col(groupCol))
    // row i (ascending by count): if the cap lands in segment
    // [n_{i−1}, n_i) — groups before i uncapped, i..G capped — then
    // total = S_{i−1} + (G−i+1)·c, giving candidate
    // c_i = (B − S_{i−1}) div (G−i+1). Every candidate is ≤ c* (the
    // segment formula OVERestimates total(c) off its own segment), and
    // the true segment's candidate equals c* — so c* is the plain MAX,
    // no validity clauses. Truncating div on a negative numerator yields
    // 0 ≥ floor, still ≤ c* (c* ≥ 0 always); both engines agree at the
    // true segment, which is all the max needs.
    val framed = counts
      .withColumn("__i", row_number().over(byN))
      .withColumn("__s", sum("n").over(byN.rowsBetween(W.unboundedPreceding, 0)))
      .withColumn("__g", count(lit(1)).over(
        byN.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)))
      .withColumn("__tot", sum("n").over(
        byN.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)))
    val cap = framed
      .agg(max(when(col("__tot") <= budget, col("n"))
        .otherwise(expr(s"($budget - (__s - n)) div (__g - __i + 1)")))
        .as("cap"))
    val withCap = counts.crossJoin(broadcast(cap))
      .withColumn("alloc0", least(col("n"), greatest(coalesce(col("cap"), lit(0L)), lit(0L))))
    // remainder: B − Σ alloc0 rows, one each to the first still-capped
    // groups in group-key order (deterministic, no weights)
    val rem = withCap.agg((lit(budget) - sum("alloc0")).as("__rem"))
      .withColumn("__rem", greatest(least(col("__rem"), lit(budget)), lit(0L)))
    val wKey = W.orderBy(col(groupCol))
    withCap.crossJoin(broadcast(rem))
      .withColumn("__bumprank",
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("n") > col("alloc0")).orderBy(col(groupCol))))
      .withColumn("alloc",
        when(col("n") > col("alloc0") && col("__bumprank") <= col("__rem"),
          col("alloc0") + 1).otherwise(col("alloc0")))
      .select(col(groupCol), col("n"), col("cap"), col("alloc"))
  }

  /** Largest-remainder (Hamilton) apportionment of an integer budget across
    * groups proportional to their row counts — the quota planner beside
    * [[fairCaps]]: fairCaps levels a budget under per-group SUPPLY limits
    * (max–min fairness), this splits it PROPORTIONALLY to observed mass
    * (the "keep the mixture's shape, shrink it to B docs" plan).
    *
    * Exact integers end to end: `base_i = (B·n_i) div N`, remainder
    * `r_i = (B·n_i) mod N`; the `B − Σbase` leftover units (provably
    * `< #groups`) go one each to the largest remainders, ties by group
    * key — so `Σalloc = B` EXACTLY, the conservation property float
    * proportions cannot give. Products run in decimal(38,0) (B·n_i
    * overflows a long at ~10¹⁰ budget × 10⁹-row groups).
    *
    * '''Plan shape (the 100-TB design).''' One map-side-combined count
    * collapses the corpus to the group-grain frame; the remainder rank is
    * a window over that frame (groups-scale, domain-bounded — the same
    * discipline as every grid epilogue here). Returns
    * `(groupCol, n, base, remainder, alloc)`. */
  def apportionBudget(df: DataFrame, groupCol: String, budget: Long)
      : DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum("n").as("__N"))
    val based = counts.crossJoin(broadcast(total))
      .withColumn("base", expr(
        s"cast((cast(n as decimal(38,0)) * ${budget}L) div __N as bigint)"))
      .withColumn("remainder", expr(
        s"cast((cast(n as decimal(38,0)) * ${budget}L) % __N as bigint)"))
    val short = based.agg(
      (lit(budget) - sum("base")).as("__short"))
    based.crossJoin(broadcast(short))
      .withColumn("__rr", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("remainder").desc, col(groupCol))))
      .withColumn("alloc",
        when(col("__rr") <= col("__short"), col("base") + 1L)
          .otherwise(col("base")))
      .select(col(groupCol), col("n"), col("base"), col("remainder"),
        col("alloc"))
  }
}
