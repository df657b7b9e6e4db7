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

  /** Profile each `lhs → rhs` candidate in `pairs` over one scan of `df`.
    * Values are compared as strings (cross-type-stable, and the audit
    * cares about identity, not arithmetic). */
  def fdProfile(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "fdProfile needs at least one candidate pair")
    val triples = explode(array(pairs.map { case (l, r) =>
      struct(lit(l).as("lhs"), lit(r).as("rhs"),
        col(l).cast("string").as("lv"), col(r).cast("string").as("rv"))
    }: _*)).as("__t")
    df.select(triples)
      .select(col("__t.lhs").as("lhs"), col("__t.rhs").as("rhs"),
        col("__t.lv").as("lv"), col("__t.rv").as("rv"))
      .filter(col("lv").isNotNull && col("rv").isNotNull)
      .groupBy("lhs", "rhs", "lv")
      .agg(count_distinct(col("rv")).as("__nrv"))
      .groupBy("lhs", "rhs")
      .agg(
        count(lit(1)).as("n_keys"),
        sum(when(col("__nrv") > 1, 1L).otherwise(0L)).as("n_violating_keys"),
        max(col("__nrv")).as("max_rhs_per_key"))
      .withColumn("holds", col("n_violating_keys") === 0)
  }
}
