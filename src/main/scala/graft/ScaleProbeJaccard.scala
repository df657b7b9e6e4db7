package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 100× probe of [[graft.llm.Dedup.exactJaccardJoin]] (r16, VERDICT task 4).
  *
  * The prefix-filter AllPairs operator became the low-threshold dedup
  * workhorse in r15 (dedup_ngram moved onto it after the LSH recall hole at
  * J=1/3), but the 100× dedup evidence predates the swap and covers the LSH
  * path. This main measures the operator's own fan-out on a corpus it can't
  * cheat: documents of ZIPFIAN words (frequency ∝ 1/rank via the
  * log-uniform transform — hot words appear in most docs, the adversarial
  * case for any token-bucketing scheme), ~25% of docs in near-duplicate
  * families of 4 (one-word edits of a shared base), 30–80 words per doc,
  * trigram sets exactly like dedup_ngram.
  *
  * At each scale × threshold it reports wall seconds, CANDIDATE-PAIR MASS
  * (the AllPairs capacity metric — verification cost is linear in it; read
  * from the operator's own `graft_exact_jaccard_*` observed metric, so the
  * number is what the operator actually enumerated, not a re-derivation),
  * verified pairs, and candidates-per-doc — the fan-out bound the
  * BENCH_NOTES operating envelope documents.
  *
  * Usage: runMain graft.ScaleProbeJaccard [nDocsBase] [scales] [thresholds]
  * Defaults: 32000 docs base (the sf0.1 grain), scales 1,10,100,
  * thresholds 3/10,5/10. Prints PROBE lines; results in BENCH_NOTES.md. */
object ScaleProbeJaccard {

  /** Deterministic Zipfian corpus, generated distributively (no driver
    * rows): word w(d, p) = floor(V^u) with u = hash(seed(d), p)/2²⁰ —
    * log-uniform over [1, V] ⇒ P(rank r) ∝ 1/r. Docs in a dup family
    * (25%) share their base doc's length and words except one salted
    * position, so family pairs sit at high trigram Jaccard (≈ (L−5)/(L+1)
    * for a one-word edit, or 1 when both members salt to the same word) —
    * mass for both thresholds to find. */
  private def corpus(spark: SparkSession, nDocs: Long, vocab: Int): DataFrame =
    spark.range(nDocs)
      .select(col("id").as("doc_id"),
        // family structure: ids ≡ 0..3 (mod 16) form a 4-doc family on
        // base id−(id%4); everyone else derives from their own id
        when(pmod(col("id"), lit(16L)) < 4, col("id") - pmod(col("id"), lit(4L)))
          .otherwise(col("id")).as("__seed"))
      // length derives from __seed, NOT doc_id: family members must share
      // their length so the one-salted-word design puts family pairs at
      // trigram Jaccard ≈ (L−5)/(L+3) — independent lengths would scatter
      // most of them below t=0.5 and the probe would measure a different
      // corpus than documented
      .withColumn("__len",
        (lit(30) + pmod(xxhash64(col("__seed"), lit(5L)), lit(51L))).cast("int"))
      .select(col("doc_id"),
        concat_ws(" ", transform(
          sequence(lit(1), col("__len")),
          p => concat(lit("w"),
            // log-uniform rank: floor(V^(h/2^20)) ∈ [1, V], P(r) ∝ 1/r;
            // position 2 is salted per DOC (not per seed) inside dup
            // families, so family members differ by exactly one word
            floor(pow(lit(vocab.toDouble),
              when(p === 2 && pmod(col("doc_id"), lit(16L)) < 4,
                pmod(xxhash64(col("doc_id"), lit(99L), p), lit(1048576L)))
                .otherwise(pmod(xxhash64(col("__seed"), p), lit(1048576L)))
                .cast("double") / lit(1048576.0))).cast("long"))))
          .as("text"))

  def main(args: Array[String]): Unit = {
    val nBase = args.lift(0).map(_.toLong).getOrElse(32000L)
    val scales = args.lift(1).getOrElse("1,10,100")
      .split(",").map(_.trim.toLong).toSeq
    val thresholds = args.lift(2).getOrElse("3/10,5/10")
      .split(",").map { s => val Array(n, d) = s.split("/"); (n.toInt, d.toInt) }
      .toSeq
    // ngram=1 exists to DEMONSTRATE the documented cliff (unigrams over a
    // closed Zipfian vocab leave no rare prefixes — exactJaccardJoin's
    // scaladoc says use ngram >= 2 for natural text); run it at 1× only
    val ngram = args.lift(3).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // drain the operator's candidate-mass observations per measured run
    val candSum = new java.util.concurrent.atomic.AtomicLong()
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        qe.observedMetrics.foreach { case (name, row) =>
          if (name.startsWith("graft_exact_jaccard_"))
            candSum.addAndGet(row.getLong(0))
        }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    })

    scales.foreach { scale =>
      val n = nBase * scale
      val docs = corpus(spark, n, vocab = 30000)
      thresholds.foreach { case (tNum, tDen) =>
        candSum.set(0)
        val t0 = System.nanoTime()
        val pairs = graft.llm.Dedup.exactJaccardJoin(
          docs, "doc_id", "text", tNum = tNum, tDen = tDen, ngram = ngram)
        val nPairs = pairs.count()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(1000) // listener bus drain
        val cand = candSum.get()
        println(f"PROBE exact_jaccard ngram=$ngram scale=${scale}%-4d docs=$n%-9d " +
          f"t=$tNum/$tDen  wall=$dt%8.1f s  candidates=$cand%-12d " +
          f"verified=$nPairs%-10d cand_per_doc=${cand.toDouble / n}%8.2f")
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }
    }
    spark.stop()
  }
}
