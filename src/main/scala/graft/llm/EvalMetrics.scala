package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lexical evaluation metrics over (reference, candidate) text pairs —
  * the distributed scoring pass behind summarization/distillation
  * filtering ("keep generations whose ROUGE against the source exceeds
  * t") and eval-set regression tracking.
  *
  * ROUGE-N (Lin 2004) is clipped n-gram MULTISET overlap: each reference
  * n-gram matches at most as many times as it occurs in the candidate.
  * Scores stay exact integers — overlap/total counts plus ppm ratios by
  * integer division — so results are engine-portable (no floating
  * accumulation order).
  *
  * '''Scale design.''' One row per (pair, distinct n-gram, side) through
  * a map-side-combined count aggregate, then an equi-join on
  * `(pair, gram)` and a final per-pair aggregate: every stage keys on
  * high-entropy composites, no windows, no cross join, candidate×reference
  * work bounded by per-doc gram counts (never corpus-quadratic — the
  * pairing is an input, not discovered here; near-dup discovery is
  * [[Dedup]]'s job).
  */
object EvalMetrics {

  /** Score each row's (reference, candidate) pair with ROUGE-N counts:
    * `(n_ref, n_cand, overlap, precision_ppm, recall_ppm, f1_ppm)` where
    * `overlap` is the clipped n-gram multiset intersection,
    * `precision = overlap/n_cand`, `recall = overlap/n_ref`, and
    * `f1 = 2PR/(P+R)` — all in exact ppm integer arithmetic
    * (`f1_ppm = 2·overlap·10⁶ div (n_ref + n_cand)`, the algebraic
    * simplification that avoids chaining two rounded divisions).
    * Normalization matches the dedup family ([[TextStats.normalizeText]]).
    * Pairs where either side has no n-gram score 0. */
  def rougeN(
      pairs: DataFrame,
      idCol: String,
      refCol: String,
      candCol: String,
      n: Int = 2): DataFrame = {
    require(n >= 1, s"n must be at least 1: got $n")
    // one materialization of the pair frame — three consumers (both gram
    // legs + the zero-gram-pair id spine); the exactJaccardJoinSets rule
    val p0 = pairs
      .select(col(idCol).as("__pid"), col(refCol).as("__ref"),
        col(candCol).as("__cand"))
      .repartition(col("__pid"))
      .localCheckpoint()
    // true n-gram MULTISET (unlike Dedup.wordNgrams: no distinct, and a
    // doc with fewer than n tokens has ZERO n-grams, not a padded stub).
    // Tokens materialize in their own projection first — the shingleDocs
    // inlining caveat: a token expression referenced inside the per-gram
    // lambda would re-tokenize once per gram position (the multiple `__tk`
    // references below block CollapseProject from inlining it).
    def gramCounts(src: String, cnt: String) =
      p0.select(col("__pid"),
          TextStats.tokens(TextStats.normalizeText(col(src))).as("__tk"))
        .select(col("__pid"),
          explode(when(size(col("__tk")) >= n,
            transform(sequence(lit(1), size(col("__tk")) - (n - 1)),
              i => concat_ws(" ", slice(col("__tk"), i, lit(n)))))
            .otherwise(array().cast("array<string>"))).as("__g"))
        .groupBy("__pid", "__g").agg(count(lit(1)).as(cnt))
    // ONE full-outer join on (pair, gram) — both legs arrive
    // hash-partitioned on exactly these keys from their aggregates, so the
    // join adds no exchange — then ONE per-pair aggregate folds totals and
    // the clipped overlap together (three separate aggregates would fork
    // the gram-leg subtrees and re-pay their shuffles)
    val merged = gramCounts("__ref", "__ca")
      .join(gramCounts("__cand", "__cb"), Seq("__pid", "__g"), "full_outer")
      .groupBy("__pid")
      .agg(sum(coalesce(col("__ca"), lit(0L))).as("n_ref"),
        sum(coalesce(col("__cb"), lit(0L))).as("n_cand"),
        sum(least(coalesce(col("__ca"), lit(0L)),
          coalesce(col("__cb"), lit(0L)))).as("overlap"))
    p0.select(col("__pid"))
      .join(merged, Seq("__pid"), "left")
      .select(col("__pid").as(idCol),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"),
        coalesce(col("overlap"), lit(0L)).as("overlap"))
      .withColumn("precision_ppm",
        when(col("n_cand") === 0, lit(0L))
          .otherwise(expr("(overlap * 1000000) div n_cand")))
      .withColumn("recall_ppm",
        when(col("n_ref") === 0, lit(0L))
          .otherwise(expr("(overlap * 1000000) div n_ref")))
      .withColumn("f1_ppm",
        when(col("n_ref") + col("n_cand") === 0, lit(0L))
          .otherwise(expr("(2 * overlap * 1000000) div (n_ref + n_cand)")))
  }

  /** Cohen's kappa between two categorical labelings in exact integer
    * ppm — chance-corrected agreement, the standard acceptance metric for
    * a heuristic classifier against ground truth (plain accuracy rewards
    * majority-class parroting; kappa doesn't). One row:
    * `n`, `po_ppm` (observed agreement), `pe_ppm` (chance agreement from
    * the marginals), `kappa_ppm = (n·diag − Σ row·col)·10⁶ div
    * (n² − Σ row·col)` — sign via `sign·(|num| div den)` truncation (kappa
    * is negative for worse-than-chance raters), decimal(38,0) throughout
    * (`n²` overflows int64 past ~3·10⁹ rows). Degenerate single-class
    * marginals (`pe = 1`) report NULL kappa.
    *
    * '''Plan shape (100 TB).''' One corpus-scale confusion-count groupBy;
    * marginals, diagonal, and the kappa arithmetic all run on the
    * #classes²-grain frame. */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cm = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(col(aCol).cast("string").as("__a"),
        col(bCol).cast("string").as("__b"))
      .groupBy("__a", "__b").agg(count(lit(1)).as("__n"))
      .localCheckpoint() // 4 consumers below; #classes² rows — tiny
    val n = cm.agg(sum("__n").as("n"))
    val diag = cm.filter(col("__a") === col("__b"))
      .agg(coalesce(sum("__n"), lit(0L)).as("__diag"))
    val peNum = cm.groupBy("__a").agg(sum("__n").as("__ra"))
      .join(cm.groupBy("__b").agg(sum("__n").as("__cb")),
        col("__a") === col("__b"))
      .agg(coalesce(sum(expr(
        "cast(__ra as decimal(38,0)) * __cb")), lit(0).cast("decimal(38,0)"))
        .as("__pe"))
    n.crossJoin(broadcast(diag)).crossJoin(broadcast(peNum))
      .withColumn("po_ppm", expr("(__diag * 1000000) div n"))
      .withColumn("pe_ppm", expr(
        "(__pe * 1000000) div (cast(n as decimal(38,0)) * n)"))
      .withColumn("__num", expr(
        "cast(n as decimal(38,0)) * __diag - __pe"))
      .withColumn("__den", expr(
        "cast(n as decimal(38,0)) * n - __pe"))
      .withColumn("kappa_ppm",
        when(col("__den") === 0, lit(null).cast("long"))
          .otherwise(
            when(col("__num") < 0, lit(-1L)).otherwise(lit(1L)) *
              expr("(abs(__num) * 1000000) div __den")))
      .select("n", "po_ppm", "pe_ppm", "kappa_ppm")
  }

  /** One-vs-rest AUC per label in exact integer ppm — the
    * Mann–Whitney/rank-sum form: `AUC = (R₊ − n₊(n₊+1)/2) / (n₊·n₋)`
    * where `R₊` sums the global ranks of the label's rows under
    * `(scoreCol, idCol)` ordering. The classifier-quality acceptance
    * metric for quality/safety scorers — threshold-free, unlike the
    * calibration audit's fixed bins.
    *
    * '''Tie contract.''' Ranks are made injective by the `idCol`
    * tie-break, so this is the deterministic tie-broken AUC (both engines
    * replay the identical permutation), not the average-rank mid-AUC —
    * for fine-grained integer scores the two differ only on exact score
    * collisions. Everything stays integral: `2·R₊ − n₊(n₊+1)` is even
    * ×10⁶ over `2·n₊·n₋`, all in decimal(38,0) (`R₊` is O(N²)).
    *
    * '''Plan shape (100 TB).''' The global rank is
    * [[graft.operators.GroupedRank]] with EMPTY groups — range-partitioned,
    * no single-task sort — then one #labels-grain aggregate and a 1-row
    * broadcast total. Labels with an empty rest-class report NULL. */
  def aucByLabel(
      df: DataFrame,
      labelCol: String,
      scoreCol: String,
      idCol: String): DataFrame = {
    val ranked = graft.operators.GroupedRank.withGroupRank(
      df.select(col(labelCol), col(scoreCol), col(idCol))
        .filter(col(labelCol).isNotNull && col(scoreCol).isNotNull),
      Seq.empty, Seq(col(scoreCol), col(idCol)), "__graft_r")
    val per = ranked.groupBy(labelCol)
      .agg(count(lit(1)).as("n_pos"),
        sum(col("__graft_r").cast("decimal(38,0)")).as("__rpos"))
    val total = per.agg(sum("n_pos").as("__n"))
    per.crossJoin(broadcast(total))
      .withColumn("n_neg", col("__n") - col("n_pos"))
      .withColumn("auc_ppm",
        when(col("n_neg") === 0, lit(null).cast("long"))
          .otherwise(expr(
            "((2 * __rpos - cast(n_pos as decimal(38,0)) * (n_pos + 1)) " +
              "* 1000000) div (2 * cast(n_pos as decimal(38,0)) * n_neg)")))
      .select(col(labelCol), col("n_pos"), col("n_neg"), col("auc_ppm"))
  }

  /** Decile lift/gains table — the business-facing twin of [[aucByLabel]]:
    * "the top 10% of scores captures N× its share of positives". Rows are
    * bucketed into `k` equal score-rank tiles (highest scores = bucket 1);
    * per bucket the positive count plus cumulative gains and the exact
    * integer lift ppm `cum_pos·N·10⁶ div (cum_n·P)` (1 000 000 = no lift).
    *
    * '''Plan shape (100 TB).''' Tiles come from
    * [[graft.operators.GroupedRank.withGroupNtile]] with EMPTY groups —
    * range-partitioned, bit-identical to SQL
    * `ntile(k) OVER (ORDER BY score DESC, id)` with no single-task sort;
    * the cumulative window then runs on the k-row bucket grid
    * (domain-bounded partitionless window). Ties on `scoreCol` break by
    * `idCol`, making the table deterministic. */
  def liftTable(
      df: DataFrame,
      scoreCol: String,
      idCol: String,
      positive: Column,
      k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = graft.operators.GroupedRank.withGroupNtile(
      df, Seq.empty, Seq(col(scoreCol).desc, col(idCol)), k = k,
      ntileCol = "decile")
      .withColumn("decile", col("decile").cast("long"))
    // k-row frame, but BOTH the cumulative branch and the totals branch
    // consume it — materialize once so the corpus scoring+rank pipeline
    // upstream isn't planned (and paid) twice
    val per = dec.groupBy("decile").agg(
      count(lit(1)).as("n"),
      sum(when(positive, 1L).otherwise(0L)).as("n_pos"))
      .localCheckpoint()
    val w = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    per
      .withColumn("cum_n", sum("n").over(w))
      .withColumn("cum_pos", sum("n_pos").over(w))
      .crossJoin(broadcast(
        per.agg(sum("n").as("__N"), sum("n_pos").as("__P"))))
      .withColumn("lift_ppm", expr(
        "cast(case when __P = 0 then null else" +
          " (cast(cum_pos as decimal(38,0)) * __N * 1000000)" +
          " div (cast(cum_n as decimal(38,0)) * __P) end as bigint)"))
      .select("decile", "n", "n_pos", "cum_n", "cum_pos", "lift_ppm")
  }
}
