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
}
