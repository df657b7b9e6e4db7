package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * North-star extension surface (SURVEY.md §2.4). Scale design: every
  * near-dup path is *bucketed before any pairwise work* (LSH bands / simhash
  * chunks), so candidate generation is a shuffle on bucket keys — never an
  * all-pairs cross join — and verification touches only candidate pairs.
  * All signatures are built from codegen'd higher-order functions +
  * `xxhash64`; no UDFs, no driver-side state.
  */
object Dedup {

  import TextStats.normalizeText

  /** Exact dedup keeping a deterministic representative per key (smallest
    * `tieBreaker`). `dropDuplicates` keeps an *arbitrary* row — fine for
    * pipelines, useless for reproducible tests — so this is window-based. */
  def exactDedup(df: DataFrame, keyCols: Seq[String], tieBreaker: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tieBreaker))
    df.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .drop("__graft_rn")
  }

  /** Distinct character k-shingles of the normalized text. */
  def charShingles(text: Column, k: Int = 5): Column = {
    val norm = normalizeText(text)
    array_distinct(transform(
      sequence(lit(1), greatest(length(norm) - (k - 1), lit(1))),
      i => norm.substr(i, lit(k))))
  }

  /** Distinct word n-grams. */
  def wordNgrams(text: Column, n: Int = 3): Column = {
    val toks = TextStats.tokens(normalizeText(text))
    array_distinct(transform(
      sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** Exact Jaccard similarity of two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column =
    when(size(array_union(a, b)) === 0, 0.0)
      .otherwise(size(array_intersect(a, b)).cast("double") /
        size(array_union(a, b)))

  /** MinHash signature: for each of `numHashes` seeded hash functions, the
    * min `xxhash64(shingle, seed)` over the shingle set. */
  def minHashSignature(shingles: Column, numHashes: Int = 16): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      h => array_min(transform(shingles, s => xxhash64(s, h))))

  /** LSH band keys: hash of each r-row stripe of the signature. Docs sharing
    * any band key are candidates (prob ≈ 1-(1-j^r)^b for Jaccard j). */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)), b))

  /** Candidate near-dup pairs (idA < idB) via MinHash LSH banding, verified
    * with exact shingle-Jaccard ≥ `threshold`.
    *
    * Dataflow: shingle+sign each doc once → explode band keys → self-join on
    * (band index, band key) → distinct pairs → verify. The band join is an
    * equi-join on a high-cardinality key — i.e. a `skewJoin`-compatible
    * shuffle, not a cross join; at 100 TB the bucket sizes stay O(dups). */
  def minHashDedupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 16,
      bands: Int = 4,
      shingleSize: Int = 5,
      threshold: Double = 0.5): DataFrame = {
    val rowsPerBand = numHashes / bands
    require(bands * rowsPerBand == numHashes, "bands must divide numHashes")
    val banded = df
      .select(col(idCol).as("id"), charShingles(col(textCol), shingleSize).as("sh"))
      .withColumn("sig", minHashSignature(col("sh"), numHashes))
      .select(col("id"), col("sh"),
        posexplode(bandKeys(col("sig"), bands, rowsPerBand)))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_key")

    val a = banded.select(col("band_idx"), col("band_key"),
      col("id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band_idx"), col("band_key"),
      col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band_idx", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .groupBy("id_a", "id_b")
      .agg(first("jaccard").as("jaccard"))
  }

  /** 64-bit SimHash over word tokens, built with a vectorized explode +
    * groupBy (map-side partial aggregation; no per-row nested loops). */
  def simHash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(TextStats.tokens(normalizeText(col(textCol)))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    // per-bit contribution: +1 if bit set else -1; 64 parallel sums
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$i")
    }
    val agg = toks.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map { i =>
      when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))
    agg.select(col("id"), sig.as("simhash"))
  }

  /** Near-dup pairs with Hamming distance ≤ `maxHamming`, found by the
    * pigeonhole trick: split the 64-bit simhash into `maxHamming + 1`
    * chunks — any pair within the distance agrees on ≥ 1 whole chunk, so
    * candidates come from an equi-join on (chunk index, chunk value). */
  def simHashDedupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val chunks = maxHamming + 1
    val bitsPer = 64 / chunks
    val sigs = simHash(df, idCol, textCol)
    val chunkCols = (0 until chunks).map { ci =>
      shiftright(col("simhash"), ci * bitsPer).bitwiseAND(lit((1L << bitsPer) - 1))
    }
    val chunked = sigs.select(col("id"), col("simhash"),
      posexplode(array(chunkCols: _*)))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "chunk_val")
    val a = chunked.select(col("chunk_idx"), col("chunk_val"),
      col("id").as("id_a"), col("simhash").as("sig_a"))
    val b = chunked.select(col("chunk_idx"), col("chunk_val"),
      col("id").as("id_b"), col("simhash").as("sig_b"))
    a.join(b, Seq("chunk_idx", "chunk_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .groupBy("id_a", "id_b")
      .agg(first("hamming").as("hamming"))
  }

  /** Candidate pairs by word-n-gram Jaccard ≥ threshold, using MinHash LSH
    * over the n-gram space for candidate generation (never all-pairs). */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      threshold: Double = 0.3): DataFrame = {
    val docs = df.select(col(idCol).as("id"), wordNgrams(col(textCol), n).as("gr"))
      .filter(size(col("gr")) > 0)
      .withColumn("sig", minHashSignature(col("gr"), 16))
      .select(col("id"), col("gr"), posexplode(bandKeys(col("sig"), 8, 2)))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_key")
    val a = docs.select(col("band_idx"), col("band_key"),
      col("id").as("id_a"), col("gr").as("gr_a"))
    val b = docs.select(col("band_idx"), col("band_key"),
      col("id").as("id_b"), col("gr").as("gr_b"))
    a.join(b, Seq("band_idx", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("gr_a"), col("gr_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .groupBy("id_a", "id_b")
      .agg(first("jaccard").as("jaccard"))
  }
}
