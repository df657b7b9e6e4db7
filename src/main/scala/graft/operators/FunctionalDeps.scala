package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Functional-dependency discovery over candidate column pairs — the
  * schema-semantics face of data profiling: does `lhs` determine `rhs`
  * (`A → B` holds iff no `lhs` value maps to two `rhs` values)? The
  * question behind key inference, denormalization safety ("can I collapse
  * this dimension"), and silent-corruption audits (an FD that held for
  * years suddenly gaining violating keys is an upstream bug alarm).
  *
  * '''Plan shape (100 TB).''' All candidate pairs ride ONE table scan:
  * each row explodes to (fd_id, lhs_value, rhs_value) triples — scan cost
  * is |pairs|·|rows| emitted rows but only one pass over the (possibly
  * wide) source — then one map-side-combined aggregation per (fd, lhs-key)
  * and a domain-scale rollup to one row per candidate. Exact
  * `count_distinct` at the key grain (never approximate: an FD audit that
  * can false-negative a violation is worthless). NULLs on either side are
  * excluded (SQL convention: an FD constrains present values; a NULL rhs
  * asserts nothing).
  *
  * Output per candidate: `(lhs, rhs, n_keys, n_violating_keys,
  * max_rhs_per_key, holds)` — `holds` iff no key saw two distinct rhs
  * values; `max_rhs_per_key` grades HOW broken a violated FD is (1 key ×
  * 2 values is a typo; every key × many values means the candidate was
  * never a dependency).
  */
object FunctionalDeps {

  private def triples(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "candidate pair list must be non-empty")
    val t = explode(array(pairs.map { case (l, r) =>
      struct(lit(l).as("lhs"), lit(r).as("rhs"),
        col(l).cast("string").as("lv"), col(r).cast("string").as("rv"))
    }: _*)).as("__t")
    df.select(t)
      .select(col("__t.lhs").as("lhs"), col("__t.rhs").as("rhs"),
        col("__t.lv").as("lv"), col("__t.rv").as("rv"))
      .filter(col("lv").isNotNull && col("rv").isNotNull)
  }

  /** Profile each `lhs → rhs` candidate in `pairs` over one scan of `df`.
    * Values are compared as strings (cross-type-stable, and the audit
    * cares about identity, not arithmetic). */
  def fdProfile(df: DataFrame, pairs: Seq[(String, String)]): DataFrame =
    triples(df, pairs)
      .groupBy("lhs", "rhs", "lv")
      .agg(count_distinct(col("rv")).as("__nrv"))
      .groupBy("lhs", "rhs")
      .agg(
        count(lit(1)).as("n_keys"),
        sum(when(col("__nrv") > 1, 1L).otherwise(0L)).as("n_violating_keys"),
        max(col("__nrv")).as("max_rhs_per_key"))
      .withColumn("holds", col("n_violating_keys") === 0)

  /** GRADED dependency strength beside [[fdProfile]]'s boolean verdict:
    * how much of `rhs`'s Gini impurity does knowing `lhs` remove? The
    * Gini-based analog of the uncertainty coefficient (Theil's U), chosen
    * over the entropy form because it is a pure RATIONAL of the counts —
    * no logarithm, so both engines replay it bit-for-bit (the repo-wide
    * exactness discipline; an entropy variant would drift in libm's last
    * ulp).
    *
    * Per candidate over non-NULL rows:
    *  - `gini_ppm` = `((n² − Σ_b n_b²)·10⁶) div n²` — the marginal
    *    impurity of rhs;
    *  - `cond_gini_ppm` = `Σ_a ((n_a² − Σ_b n_ab²)·10⁶) div (n·n_a)` —
    *    the lhs-weighted impurity, each key's term truncated THEN summed
    *    (the documented convention: per-key truncation keeps every term an
    *    exact integer, and the sum order-independent);
    *  - `gini_drop_ppm` = their difference — ≈ 0 means lhs tells you
    *    nothing about rhs; ≈ gini_ppm means lhs determines rhs (and
    *    [[fdProfile]]'s `holds` flips true).
    *
    * '''Plan shape (100 TB).''' All candidates ride one scan to the
    * (fd, lv, rv) count grain; the conditional and marginal branches each
    * re-aggregate that count frame (value-pair grain, not rows) and join
    * at candidate grain. decimal(38,0) throughout — n² ·10⁶ holds to
    * n ≈ 10¹⁶ rows. */
  def giniStrength(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    val dec: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      _.cast("decimal(38,0)")
    val cnt = triples(df, pairs)
      .groupBy("lhs", "rhs", "lv", "rv")
      .agg(count(lit(1)).cast("decimal(38,0)").as("n_ab"))
    val a = cnt.groupBy("lhs", "rhs", "lv")
      .agg(sum(col("n_ab")).as("n_a"),
        sum(col("n_ab") * col("n_ab")).as("ssqa"))
    val tot = a.groupBy("lhs", "rhs").agg(sum(col("n_a")).as("n"))
    val cond = a.join(tot, Seq("lhs", "rhs"))
      .withColumn("__term",
        expr("((n_a * n_a - ssqa) * 1000000) div (n * n_a)"))
      .groupBy("lhs", "rhs")
      .agg(sum(col("__term")).cast("long").as("cond_gini_ppm"))
    val gin = cnt.groupBy("lhs", "rhs", "rv")
      .agg(sum(col("n_ab")).as("n_b"))
      .groupBy("lhs", "rhs")
      .agg(sum(col("n_b") * col("n_b")).as("ssqb"))
      .join(tot, Seq("lhs", "rhs"))
      .withColumn("gini_ppm",
        expr("((n * n - ssqb) * 1000000) div (n * n)").cast("long"))
    gin.join(cond, Seq("lhs", "rhs"))
      .select(col("lhs"), col("rhs"), dec(col("n")).cast("long").as("n"),
        col("gini_ppm"), col("cond_gini_ppm"),
        (col("gini_ppm") - col("cond_gini_ppm")).as("gini_drop_ppm"))
  }
}
