package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking (the Deequ/expectations
  * shape): declare a suite of constraints over a table, get back one small
  * report row per constraint — `(constraint, violations, total, passed)` —
  * the pipeline-gate primitive that decides whether a day's ingest is fit
  * to train on before anything expensive runs over it.
  *
  * North-star extension surface (SURVEY.md §2.4): a 100-TB pipeline does
  * not "eyeball" a corpus; it asserts completeness (NOT NULL), key
  * uniqueness, domain membership, value ranges, format regexes, and
  * referential integrity, and fails the run on violation.
  *
  * '''Plan shape (the 100-TB design).''' Every ROW-LEVEL constraint
  * (not-null / range / set / regex) folds into ONE shared aggregate pass —
  * `sum(violated::int)` per constraint, map-side combined, one scan of the
  * table no matter how many constraints ride it. [[Constraint.Unique]]
  * adds one `groupBy(keys)` (its violation count is `Σ(n−1)` over groups,
  * again map-side combined — never a window co-locating whole key groups).
  * [[Constraint.SubsetOf]] adds one anti-join against the DISTINCT
  * reference keys (dimension-scale build side — AQE broadcasts it). The
  * report itself is O(#constraints) rows.
  */
object Constraints {

  sealed trait Constraint { def label: String }
  object Constraint {
    /** `column` must never be NULL. */
    final case class NotNull(column: String) extends Constraint {
      def label = s"not_null($column)"
    }
    /** `columns` combinations must be unique; violations = surplus rows. */
    final case class Unique(columns: Seq[String]) extends Constraint {
      def label = s"unique(${columns.mkString(",")})"
    }
    /** `lo ≤ column ≤ hi` (NULL violates — range asserts presence too). */
    final case class InRange(column: String, lo: Double, hi: Double)
        extends Constraint {
      def label = s"in_range($column)"
    }
    /** `column ∈ values` (NULL violates). */
    final case class InSet(column: String, values: Seq[String])
        extends Constraint {
      def label = s"in_set($column)"
    }
    /** `column` fully matches `regex` (RE2-portable subset; NULL violates). */
    final case class Matches(column: String, regex: String) extends Constraint {
      def label = s"matches($column)"
    }
    /** Every non-null `column` value exists in `ref.refColumn`
      * (referential integrity / foreign key). */
    final case class SubsetOf(column: String, ref: DataFrame, refColumn: String)
        extends Constraint {
      def label = s"subset_of($column,$refColumn)"
    }
    /** k-anonymity over the quasi-identifier `columns`: every combination
      * must be shared by at least `k` rows; violations = the rows living
      * in smaller-than-k groups (the re-identifiable rows — the governance
      * gate a PII-bearing release runs before publication). NULL counts as
      * an ordinary QI value (groupBy semantics). */
    final case class KAnonymity(columns: Seq[String], k: Int) extends Constraint {
      require(k >= 2, "k-anonymity needs k >= 2")
      def label = s"k_anonymity(${columns.mkString(",")},$k)"
    }
    /** l-diversity over the quasi-identifier `columns` with respect to
      * `sensitive`: every QI group must contain at least `l` DISTINCT
      * non-null sensitive values; violations = the rows in
      * less-diverse groups. k-anonymity's complement against the
      * homogeneity attack — a group can be large (k-anonymous) yet leak
      * the sensitive attribute outright because every member shares it.
      * NULL sensitive values don't count toward diversity (an all-null
      * group has 0 distinct values and violates any l ≥ 1). */
    final case class LDiversity(columns: Seq[String], sensitive: String, l: Int)
        extends Constraint {
      require(l >= 2, "l-diversity needs l >= 2")
      def label = s"l_diversity(${columns.mkString(",")},$sensitive,$l)"
    }
  }
  import Constraint._

  /** Evaluate `constraints` over `df`. Returns one row per constraint:
    * `(constraint, violations, total, passed)`, where `total` is the row
    * count of `df` and `passed = (violations == 0)`. */
  def check(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "constraint suite must not be empty")
    // labels key the shared-pass aggregate aliases (`__v_<label>`): two
    // constraints of the same type on the same column (e.g. two InRange with
    // different bounds) would alias-collide and surface as an opaque
    // ambiguous-reference AnalysisException deep in the plan — fail clearly
    // up front instead.
    val dupLabels = constraints.groupBy(_.label).collect {
      case (l, cs) if cs.size > 1 => l
    }
    require(dupLabels.isEmpty,
      s"duplicate constraint labels (same type+column declared twice): " +
        s"${dupLabels.mkString(", ")} — deduplicate the suite")
    val spark = df.sparkSession
    // "good" predicates; a NULL value fails every constraint except where
    // the constraint is about null itself — coalesce(pred, false) makes the
    // three-valued SQL result concrete instead of silently uncounted
    val rowLevel = constraints.collect {
      case c: NotNull => c.label -> col(c.column).isNotNull
      case c: InRange =>
        c.label -> (col(c.column) >= c.lo && col(c.column) <= c.hi)
      case c: InSet => c.label -> col(c.column).isInCollection(c.values)
      case c: Matches => c.label -> col(c.column).rlike("^(?:" + c.regex + ")$")
    }
    // one shared pass: total + every row-level violation count
    val aggs = count(lit(1)).as("__total") +: rowLevel.map { case (label, good) =>
      coalesce(sum((!coalesce(good, lit(false))).cast("long")), lit(0L))
        .as(s"__v_$label")
    }
    val base = df.agg(aggs.head, aggs.tail: _*)
      .localCheckpoint() // one scan, materialized once; every row reuses it
    // each constraint → a 1-row (constraint, violations, total, passed)
    // frame; Unique/SubsetOf contribute their own 1-row aggregate
    // cross-joined with the shared base (single-row × single-row — free).
    // No collects: the report is a plan, runnable anywhere.
    def finish(label: String, oneRow: DataFrame) =
      oneRow.crossJoin(base).select(lit(label).as("constraint"),
        col("__v").cast("long").as("violations"),
        col("__total").as("total"), (col("__v") === 0).as("passed"))
    val rows = constraints.map {
      case c: Unique =>
        finish(c.label, df.groupBy(c.columns.map(col): _*)
          .agg(count(lit(1)).as("__n"))
          .agg(coalesce(sum(col("__n") - 1), lit(0L)).as("__v")))
      case c: SubsetOf =>
        finish(c.label,
          df.select(col(c.column).as("__k")).filter(col("__k").isNotNull)
            .join(c.ref.select(col(c.refColumn).as("__k")).distinct(),
              Seq("__k"), "left_anti")
            .agg(count(lit(1)).as("__v")))
      case c: KAnonymity =>
        // one groupBy at QI grain (map-side combined counts), violations =
        // Σ n over groups with n < k — never a window co-locating groups
        finish(c.label, df.groupBy(c.columns.map(col): _*)
          .agg(count(lit(1)).as("__n"))
          .agg(coalesce(sum(when(col("__n") < c.k, col("__n"))), lit(0L))
            .as("__v")))
      case c: LDiversity =>
        // same QI-grain aggregate plus an exact distinct of the sensitive
        // column (Spark partial-aggregates the (QI, sensitive) pairs first
        // — no group co-location, skew-safe like KAnonymity)
        finish(c.label, df.groupBy(c.columns.map(col): _*)
          .agg(count(lit(1)).as("__n"),
            countDistinct(col(c.sensitive)).as("__d"))
          .agg(coalesce(sum(when(col("__d") < c.l, col("__n"))), lit(0L))
            .as("__v")))
      case c =>
        base.select(lit(c.label).as("constraint"),
          col(s"__v_${c.label}").cast("long").as("violations"),
          col("__total").as("total"), (col(s"__v_${c.label}") === 0).as("passed"))
    }
    rows.reduce(_.unionAll(_))
  }

  /** ZERO-extra-pass monitoring: attach row-level constraints to a
    * DataFrame as `Observation` metrics — the counts ride whatever action
    * the pipeline already runs (the write, the aggregate), costing no
    * additional scan at all, where [[check]] is its own job. The
    * production split: `check` gates an ingest before anything runs;
    * `observed` audits a transform the pipeline was running anyway.
    *
    * Row-level constraints only (not-null/range/set/regex): uniqueness and
    * referential integrity need their own shuffles and cannot piggyback.
    * After ANY action on the returned DataFrame,
    * `observation.get(label)` yields that constraint's violation count
    * (plus `"rows"` for the total).
    */
  def observed(df: DataFrame, constraints: Seq[Constraint],
      name: String = "graft_constraints")
      : (DataFrame, org.apache.spark.sql.Observation) = {
    require(constraints.nonEmpty, "constraint suite must not be empty")
    val rowLevel = constraints.map {
      case c: NotNull => c.label -> col(c.column).isNotNull
      case c: InRange =>
        c.label -> (col(c.column) >= c.lo && col(c.column) <= c.hi)
      case c: InSet => c.label -> col(c.column).isInCollection(c.values)
      case c: Matches => c.label -> col(c.column).rlike("^(?:" + c.regex + ")$")
      case c => throw new IllegalArgumentException(
        s"observed supports row-level constraints only, got ${c.label} " +
          "(unique/referential constraints need their own shuffle — use check)")
    }
    val obs = org.apache.spark.sql.Observation(name)
    val aggs = count(lit(1)).as("rows") +: rowLevel.map { case (label, good) =>
      coalesce(sum((!coalesce(good, lit(false))).cast("long")), lit(0L))
        .as(label)
    }
    (df.observe(obs, aggs.head, aggs.tail: _*), obs)
  }
}
