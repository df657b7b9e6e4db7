package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity resolution via multi-key blocking + edit-distance verification —
  * the classic record-linkage shape (Fellegi–Sunter framing; the
  * blocking-key survey is Christen, "A survey of indexing techniques for
  * scalable record linkage and deduplication", TKDE 24(9), 2012): never
  * compare all `n×m` record pairs; generate candidates from cheap
  * deterministic BLOCKING keys (phone, name fragments, zip), union the
  * blocks, then run the expensive pairwise comparator only on candidates.
  *
  * '''Plan shape (the 100-TB design).''' Each blocking key is one
  * equi-join (shuffle on the key, skewJoin-compatible); NULL block keys
  * are dropped on both sides BEFORE the join (a NULL block would
  * cross-match every unparseable record); candidate pairs are
  * deduplicated across blocks BEFORE the Levenshtein comparator runs
  * (`levenshtein` is codegen'd but O(len²) per pair — the bucket-then-
  * verify discipline of the dedup family applies); and best-match
  * selection is a per-left-id window over candidate-scale data. Record
  * payloads travel only into the verify join — blocking ships
  * (id, key) pairs.
  */
object RecordLinkage {

  /** Candidate (id_l, id_r) pairs: union of equi-joins over the blocking
    * key expression pairs, deduplicated. */
  def candidates(
      left: DataFrame, idL: String,
      right: DataFrame, idR: String,
      blocks: Seq[(Column, Column)]): DataFrame = {
    require(blocks.nonEmpty, "need at least one blocking key pair")
    blocks.map { case (lk, rk) =>
      left.select(col(idL).as("id_l"), lk.as("__bk"))
        .filter(col("__bk").isNotNull)
        .join(right.select(col(idR).as("id_r"), rk.as("__bk"))
          .filter(col("__bk").isNotNull), "__bk")
        .select("id_l", "id_r")
    }.reduce(_ unionAll _).distinct()
  }

  /** Full linkage: block, dedup, verify `levenshtein(nameL, nameR) <=
    * maxDistance`, and keep each left record's BEST match (smallest
    * distance, ties to the smallest right id — deterministic).
    *
    * @return (id_l, id_r, distance)
    */
  def linkBest(
      left: DataFrame, idL: String, nameL: String,
      right: DataFrame, idR: String, nameR: String,
      blocks: Seq[(Column, Column)],
      maxDistance: Int): DataFrame = {
    require(maxDistance >= 0, s"maxDistance must be non-negative: $maxDistance")
    val scored = candidates(left, idL, right, idR, blocks)
      .join(left.select(col(idL).as("id_l"), col(nameL).as("__nl")), Seq("id_l"))
      .join(right.select(col(idR).as("id_r"), col(nameR).as("__nr")), Seq("id_r"))
      .withColumn("distance", levenshtein(col("__nl"), col("__nr")))
      .filter(col("distance") <= maxDistance)
    val w = Window.partitionBy("id_l").orderBy(col("distance"), col("id_r"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select("id_l", "id_r", "distance")
  }
}
