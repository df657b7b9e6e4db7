package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Primary-key contract gate (r17): operators whose semantics DEPEND on a
  * key column being non-null and unique — dedup tie-breaks ("keep the
  * lowest doc_id"), pair enumeration (`id_a < id_b`), packing/shard order,
  * deterministic sampling splits, ANN ids, arrival-ordered stream folds —
  * produce silently wrong or nondeterministic output when a real ingest
  * violates that contract (upstream retries re-deliver rows; a malformed
  * extract NULLs an id). The reference coerces keys to strings and joins
  * on whatever arrives (`dfimplicits.scala:46-47`, silent); this library's
  * contract is the opposite: detect and fail LOUDLY.
  *
  * '''Modes.''' Default (conf `graft.keycheck` unset or `off`): zero-cost
  * pass-through — the returned frame IS the input, no plan change, so the
  * bench fingerprints of every pinned query are untouched. Strict mode
  * (`graft.keycheck=strict`): validate EAGERLY — one aggregate job over
  * the key column (count NULLs; surplus rows = `count − countDistinct`) —
  * and throw with a message naming the key and both counts. Eager by
  * design: a lazy per-row `raise_error` column can be pruned away by the
  * optimizer when the query never reads the key downstream, which would
  * turn the gate into a no-op exactly when the contract matters most.
  *
  * '''100-TB story.''' A production pipeline runs the key audit ONCE at
  * ingest — [[Constraints]] with `NotNull`+`Unique` folds it into the
  * shared constraint pass (see the `key_contract_audit` query) — and runs
  * the operator surface unchecked. Strict mode exists for the differential
  * fuzz gate (`FuzzCorpus` bad-key seeds ≤ -100) to PROVE each keyed
  * operator's failure mode under a broken ingest is this loud error, not
  * silent mis-dedup.
  */
object KeyContract {

  /** The registered message prefix `scripts/fuzzcheck.py`'s BADKEY_REJECT
    * matches on — change one, change both. */
  val MSG = "primary-key contract violated"

  def strict(df: DataFrame): Boolean = strict(df.sparkSession)

  def strict(spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.conf.getOption("graft.keycheck").contains("strict")

  /** Pass-through by default; in strict mode eagerly require `key`
    * non-null and unique in `df`, else throw `IllegalArgumentException`
    * with [[MSG]], the key name, and the NULL/duplicate counts. */
  def checked(df: DataFrame, key: String): DataFrame = {
    if (strict(df)) {
      val row = df.agg(
        sum(col(key).isNull.cast("long")).as("n_null"),
        (count(col(key)) - countDistinct(col(key))).as("n_dup")).head()
      // sum over an empty frame is NULL, not 0 — an empty table has no
      // violating rows
      val nNull = if (row.isNullAt(0)) 0L else row.getLong(0)
      val nDup = row.getLong(1)
      require(nNull == 0L && nDup == 0L,
        s"$MSG on '$key': $nNull NULL ids, $nDup surplus duplicate rows — " +
          s"this operator's semantics need '$key' as a total order; " +
          s"audit the ingest (Constraints NotNull+Unique) and fix upstream")
    }
    df
  }
}
