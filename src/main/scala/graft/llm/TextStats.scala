package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, document fingerprinting.
  *
  * All of these are pure `org.apache.spark.sql.functions` compositions
  * (whole-stage-codegen friendly, no UDFs) so they stay inside Tungsten at
  * 100 TB. The reference has no text operators — this implements the
  * north-star extension surface (SURVEY.md §2.4).
  */
object TextStats {

  /** Whitespace tokens, empty-safe (`""` → 0 tokens, not 1). */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => length(t) > 0)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish sub-word unit count: alphanumeric runs + each non-alnum,
    * non-space character counts as its own token (a cheap, deterministic
    * proxy for a real tokenizer's token count).
    *
    * Counted as runs + `length` of the text with `[a-zA-Z0-9 ]` removed:
    * `length` counts CODEPOINTS, so an astral-plane character (emoji) is
    * ONE token. The previous lookaround-split formulation walked UTF-16
    * units and counted each surrogate half separately — off by one per
    * astral character vs the DuckDB replay (r15 differential fuzz). */
  def subwordCount(text: Column): Column =
    size(filter(split(text, "[^a-zA-Z0-9]+"), t => length(t) > 0)) +
      length(regexp_replace(text, "[a-zA-Z0-9 ]", ""))

  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,;:!?]", ""))

  /** Per-group readability profile — the Flesch-style complexity signal in
    * EXACT integer ppm, for "is this source textbook prose or legalese"
    * curation calls. Flesch itself is a float affine of two ratios; the
    * engine-exact contract surface is the ratios (the repo-wide
    * discipline: ship the integer sufficient statistic, let the caller
    * fold floats):
    *  - `words_per_sentence_ppm` = `(Σwords·10⁶) div Σsentences` —
    *    sentence = a `[.!?]+` run (abbreviation dots inflate this slightly;
    *    a documented, deterministic convention);
    *  - `syllables_per_word_ppm` = `(Σvowel_groups·10⁶) div Σwords` —
    *    syllable ≈ `[aeiou]+` run in the lowercased text, the classic
    *    counting proxy.
    * Ratios are of GROUP SUMS (corpus-level readability, robust to
    * per-doc zero-sentence degenerate rows); groups with zero sentences
    * or words report NULL for the undefined ratio rather than a fake 0.
    *
    * '''Plan shape (100 TB).''' Three codegen'd regex counters per row,
    * one map-side-combined groupBy — no explode, no second pass. */
  def readabilityStats(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(col(groupCol),
      tokenCount(t).cast("long").as("__w"),
      regexp_count(t, lit("[.!?]+")).cast("long").as("__s"),
      regexp_count(lower(t), lit("[aeiou]+")).cast("long").as("__v"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"),
        sum("__w").as("n_words"),
        sum("__s").as("n_sentences"),
        sum("__v").as("n_vowel_groups"))
      .withColumn("words_per_sentence_ppm",
        when(col("n_sentences") === 0, lit(null).cast("long"))
          .otherwise(expr("(n_words * 1000000) div n_sentences")))
      .withColumn("syllables_per_word_ppm",
        when(col("n_words") === 0, lit(null).cast("long"))
          .otherwise(expr("(n_vowel_groups * 1000000) div n_words")))
  }

  /** Stopword-profile language scores. Deterministic fixed-precedence
    * argmax (en > fr > es > de) so the result is reproducible and
    * SQL-replicable; CJK character presence short-circuits to zh.
    */
  val stopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is"),
    "fr" -> Seq("le", "la", "les", "et", "un", "une", "est"),
    "es" -> Seq("el", "los", "las", "y", "un", "una", "es"),
    "de" -> Seq("der", "die", "das", "und", "ein", "ist", "von"))

  def stopwordCount(text: Column, words: Seq[String]): Column = {
    val wordSet = words.map(lit(_))
    size(filter(split(lower(text), "\\s+"), t => t.isin(wordSet: _*)))
  }

  def cjkCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[\\x{4e00}-\\x{9fff}]", ""))

  /** n-gram/stopword heuristic language ID → 'en'|'fr'|'es'|'de'|'zh'|'und'. */
  def langId(text: Column): Column = {
    val scores = stopwordProfiles.map { case (l, ws) => l -> stopwordCount(text, ws) }.toMap
    val Seq(en, fr, es, de) = Seq("en", "fr", "es", "de").map(scores)
    when(cjkCount(text) * 10 > length(text) * 3, "zh")
      .when(en >= fr && en >= es && en >= de && en > 0, "en")
      .when(fr >= es && fr >= de && fr > 0, "fr")
      .when(es >= de && es > 0, "es")
      .when(de > 0, "de")
      .otherwise("und")
  }

  /** Normalization used for fingerprints / exact dedup: lowercase, strip
    * non-alphanumerics to spaces, collapse whitespace. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  /** Content fingerprint of the normalized text (md5 hex — portable across
    * engines, so it doubles as an oracle-checkable exact-dup key). */
  def fingerprint(text: Column): Column = md5(normalizeText(text))

  /** Per-group lexical richness: token mass, vocabulary size (types),
    * hapax legomena (types occurring exactly once), and the two classic
    * ratios in exact ppm — type-token ratio (types/tokens: low = rote,
    * template-heavy text; the quality signal n-gram repetition only
    * approximates) and hapax share (hapax/types: the Zipf tail mass —
    * collapses under boilerplate/dedup-worthy corpora). Tokens are
    * [[normalizeText]] whitespace tokens, so the contract replays exactly
    * in SQL.
    *
    * '''Plan shape (100 TB).''' One explode + map-side-combined groupBy to
    * (group, token) counts — the same single corpus exchange a TF table
    * costs — then a #vocab-grain fold per group. No window, no second
    * corpus pass. */
  def lexicalRichness(
      df: DataFrame, groupCol: String, textCol: String): DataFrame =
    // spread: tokenize+explode+partial-agg otherwise runs in the scan
    // stage — one task on a single-split input
    graft.sources.Spread.spread(
        df.select(col(groupCol), col(textCol).as("__text")))
      .select(col(groupCol),
        explode(tokens(normalizeText(col("__text")))).as("__tok"))
      .groupBy(col(groupCol), col("__tok"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(groupCol))
      .agg(
        sum(col("__c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("__c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .withColumn("ttr_ppm", expr("(n_types * 1000000) div n_tokens"))
      .withColumn("hapax_ppm", expr("(n_hapax * 1000000) div n_types"))

  /** Web-page chrome removal: strip `<script>`/`<style>` blocks (their
    * CONTENT is not page text), drop all remaining tags, decode the six
    * ubiquitous character entities, and collapse whitespace — the
    * regex-only first pass of a CommonCrawl-style HTML→text step (a DOM
    * parser adds structure awareness; this recovers the text mass). All
    * RE2-portable patterns, so any engine replays it exactly. Applied
    * BEFORE [[normalizeText]] in a cleaning pipeline — entity decoding
    * must see `&amp;` intact, normalization would destroy it. */
  def stripHtml(html: Column): Column = {
    // (?is): case-insensitive, dot-matches-newline — script/style blocks
    // span lines. Two separate block patterns (RE2 has no backreferences,
    // and the oracle replays these in an RE2 engine); lazy .*? is
    // RE2-portable.
    val noScript = regexp_replace(html,
      "(?is)<script\\b[^>]*>.*?</script\\s*>", " ")
    val noBlocks = regexp_replace(noScript,
      "(?is)<style\\b[^>]*>.*?</style\\s*>", " ")
    val noTags = regexp_replace(noBlocks, "(?s)<[^>]*>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&" // amp LAST: &amp;lt; → &lt; stays literal
    ).foldLeft(noTags) { case (c, (ent, ch)) =>
      regexp_replace(c, ent, ch) // entity literals are regex-metachar-free
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Per-group token-distribution drift between two corpus snapshots:
    * TOTAL-VARIATION distance in ppm — the token-level complement to
    * [[Quantize.embeddingDrift]]'s embedding-space monitor, and the
    * "did this source's vocabulary shift between crawls?" audit that
    * gates a retrain. TV = ½·Σ_t |p_a(t) − p_b(t)| over the union token
    * set, reported integer-exact as
    * `tv_ppm = ⌊Σ_t |c_a·N_b − c_b·N_a| · 10⁶ / (2·N_a·N_b)⌋`
    * (0 = identical distributions, 10⁶ = disjoint; a group empty on one
    * side reports 10⁶). All products and the Σ run in DECIMAL(38,0) —
    * c·N alone overflows int64 near 10⁹·10⁹ tokens — with ONE integral
    * division at the end, so any engine replays it bit-for-bit.
    *
    * '''Plan shape (the 100-TB design).''' One exchange at (group, token)
    * grain with map-side partial counts (the union of both snapshots is
    * tagged, not joined); per-group totals are a second aggregate over
    * the token-grain frame (group-cardinality rows) broadcast back. No
    * token-level join of A against B, no window, no driver state. */
  def tokenDriftTV(
      a: DataFrame, b: DataFrame,
      groupCol: String, textCol: String): DataFrame = {
    def toks(df: DataFrame, tag: Int) = df.select(
      col(groupCol).as("__g"),
      explode(tokens(normalizeText(col(textCol)))).as("__tok"),
      lit(tag).as("__s"))
    val counts = toks(a, 0).unionAll(toks(b, 1))
      .groupBy("__g", "__tok")
      .agg(
        sum(when(col("__s") === 0, 1L).otherwise(0L)).as("__ca"),
        sum(when(col("__s") === 1, 1L).otherwise(0L)).as("__cb"))
    val totals = counts.groupBy("__g")
      .agg(sum("__ca").as("__na"), sum("__cb").as("__nb"))
    counts.join(broadcast(totals), Seq("__g"))
      .groupBy(col("__g"), col("__na"), col("__nb"))
      .agg(sum(expr(
        "abs(cast(__ca as decimal(38,0)) * cast(__nb as decimal(38,0)) - " +
          "cast(__cb as decimal(38,0)) * cast(__na as decimal(38,0)))"))
        .as("__num"))
      .select(
        col("__g").as(groupCol),
        col("__na").as("n_tokens_a"),
        col("__nb").as("n_tokens_b"),
        when(col("__na") === 0 || col("__nb") === 0, lit(1000000L))
          .otherwise(expr(
            "(__num * 1000000) div " +
              "(2 * cast(__na as decimal(38,0)) * cast(__nb as decimal(38,0)))"))
          .as("tv_ppm"))
  }

  /** Per-group character n-gram diversity audit (the "distinct-n" corpus
    * diversity metric): distinct n-grams across the whole group vs total
    * n-gram occurrences, as an integer ppm ratio. A template-heavy,
    * boilerplate-heavy, or self-repetitive source shows a low ratio — the
    * corpus-level complement of the per-document
    * [[repetitionFeatures]].
    *
    * Gram convention matches [[graft.functions.CharShingleSet]]: text is
    * [[normalizeText]]-normalized, a document of L chars contributes
    * `max(L-n+1, 1)` occurrences (a doc shorter than n contributes its
    * whole text as one gram; an empty one a single empty gram). NULL texts
    * are skipped.
    *
    * Scale: one per-group (count, sum) aggregate plus a distinct-gram
    * count via explode → composite-key distinct → count, all map-side
    * combined; no windows, no driver state. The ppm numerator
    * `distinct_grams × 10⁶` cannot overflow int64 in practice: distinct
    * CHAR n-grams are alphabet-bounded (37ⁿ over the normalized
    * alphabet), and even free-form grams would need ~9×10¹² distincts.
    */
  def ngramDiversity(
      df: DataFrame, groupCol: String, textCol: String, n: Int = 3): DataFrame = {
    // spread: the normalize+shingle+explode pipeline otherwise runs inside
    // the scan stage — one task on a single-split input (r18: 7.3 of this
    // query's 7.6 s); both consumers (totals, distincts) recompute above
    // the one spread exchange, in parallel
    val g = graft.sources.Spread.spread(df
        .filter(col(textCol).isNotNull)
        .select(col(groupCol).as("__g"), col(textCol).as("__text")))
      .select(col("__g"), normalizeText(col("__text")).as("__norm"))
      .select(col("__g"),
        greatest(length(col("__norm")) - (n - 1), lit(1)).cast("long").as("__tot"),
        graft.functions.CharShingleSet.charShingleSet(col("__norm"), n).as("__gr"))
    val totals = g.groupBy("__g")
      .agg(count(lit(1)).as("n_docs"), sum("__tot").as("total_grams"))
    val distincts = g.select(col("__g"), explode(col("__gr")).as("__gram"))
      .distinct()
      .groupBy("__g").agg(count(lit(1)).as("distinct_grams"))
    totals.join(distincts, Seq("__g"))
      .select(col("__g").as(groupCol), col("n_docs"), col("total_grams"),
        col("distinct_grams"),
        expr("(distinct_grams * 1000000) DIV total_grams").as("diversity_ppm"))
  }

  /** Rolling k-gram hash stream of a normalized text. Pass a *materialized*
    * column — an expression tree here would be inlined into the lambda and
    * re-evaluated per gram position. */
  def gramHashes(norm: Column, k: Int = 8): Column =
    transform(
      sequence(lit(1), greatest(length(norm) - (k - 1), lit(1))),
      i => xxhash64(norm.substr(i, lit(k))))

  // Winnowing fingerprints (the MOSS algorithm) live in
  // [[graft.functions.WinnowFingerprints]] as a one-pass codegen'd
  // expression (rolling hashes + monotonic-deque sliding minima). An HOF
  // formulation (transform over positions of array_min(slice(grams, p, w)))
  // is not an option: CollapseProject inlines the gram stream into the
  // per-position lambda and re-evaluates the normalization + hashing per
  // position — O(n²) regexes per document. gramHashes above remains the
  // relational reference the WinnowSpec proves bit-identity against.

  /** Positional token n-grams of exactly length `n`, WITH multiplicity
    * (docs shorter than `n` tokens yield none). Pass a materialized token
    * array — `toks` is referenced multiple times, which keeps
    * CollapseProject from inlining an upstream tokenization into the
    * per-position lambda (BENCH_NOTES.md lesson 2). */
  def tokenNgrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Within-document repetition features (the Gopher repetition rules'
    * building block): total vs distinct `n`-gram counts and the duplicate
    * fraction. Boilerplate-heavy machine text repeats n-grams; natural text
    * mostly doesn't. The gram array never leaves its projection — per-doc
    * counts only, no explode, no shuffle beyond the caller's. */
  def repetitionFeatures(df: DataFrame, textCol: String, n: Int = 3): DataFrame = {
    val withGrams = df
      .withColumn("__toks", tokens(normalizeText(col(textCol))))
      .withColumn("__grams", tokenNgrams(col("__toks"), n))
    withGrams
      .withColumn("n_grams", size(col("__grams")).cast("long"))
      .withColumn("n_distinct_grams",
        size(array_distinct(col("__grams"))).cast("long"))
      .withColumn("dup_gram_ratio",
        when(col("n_grams") > 0,
          lit(1.0) - col("n_distinct_grams").cast("double") / col("n_grams"))
          .otherwise(lit(0.0)))
      .drop("__toks", "__grams")
  }

  /** Gopher-style rule-based quality filter: per-document boolean rule
    * columns plus the conjunction `keep`. Each rule is a threshold on an
    * exact integer count (or a single IEEE division of two of them), so the
    * verdicts are bit-reproducible across engines — the filter can gate a
    * 100-TB corpus and still be audited row-for-row by any SQL engine.
    * Thresholds are the knobs; the defaults reflect the published rules
    * (word-count window, mean-word-length window, symbol ratio, stopword
    * presence) scaled to short-document corpora. All codegen'd built-ins;
    * the filter runs inside the scan's WholeStageCodegen span.
    */
  def gopherFlags(df: DataFrame, textCol: String,
      minTokens: Int = 30, maxTokens: Int = 80,
      minAvgTokenLen: Double = 3.0, maxAvgTokenLen: Double = 5.0,
      maxPunctRatio: Double = 0.1): DataFrame = {
    val t = col(textCol)
    val nTok = tokenCount(t).cast("long")
    val nChars = length(t).cast("long")
    val nPunct = punctCount(t).cast("long")
    // divisors clamped with greatest(_, 1): boolean guards (`nTok > 0`)
    // do NOT short-circuit the division under ANSI mode — an empty/
    // whitespace-only document made the raw `/ nTok` throw DIVIDE_BY_ZERO
    // (found by the r15 differential fuzz corpus). The clamped value only
    // flows where the guard already made the flag's outcome independent
    // of it.
    val avgLen = (nChars - nTok + 1).cast("double") / greatest(nTok, lit(1L))
    df.withColumn("tokens_ok", nTok.between(minTokens, maxTokens))
      .withColumn("avg_len_ok",
        nTok > 0 && avgLen >= minAvgTokenLen && avgLen <= maxAvgTokenLen)
      .withColumn("punct_ok",
        nChars === 0 ||
          nPunct.cast("double") / greatest(nChars, lit(1L)) <= maxPunctRatio)
      .withColumn("has_stopword",
        stopwordCount(t, stopwordProfiles.flatMap(_._2)) > 0)
      .withColumn("keep",
        col("tokens_ok") && col("avg_len_ok") && col("punct_ok") &&
          col("has_stopword"))
  }

  /** Hashed-feature linear model score — the fasttext-style quality/domain
    * classifier stand-in: each token hashes into one of `weights.size`
    * buckets (the portable 60-bit md5 hash, mod table size) and the
    * document's score is the sum of its tokens' bucket weights.
    *
    * The model is a PARAMETER (a trained weight vector supplied by the
    * caller — the same model-as-data convention as IVF centroids/PQ
    * codebooks), inlined as a plan literal: scoring is a narrow,
    * codegen'd map over the scan — no shuffle, no UDF, no state.
    *
    * Weights are INTEGERS in millionths: summing doubles is
    * order-sensitive in the last ulp (and SQL aggregates order
    * arbitrarily), so the score is an exact integer sum divided once by
    * 1e6 — bit-reproducible anywhere, exactly SQL-replayable. */
  def hashedLinearScore(text: Column, weightsMicro: Seq[Long]): Column =
    hashedLinearScoreMicro(text, weightsMicro).cast("double") / 1000000.0

  /** [[hashedLinearScore]]'s exact integer micro total before the single
    * division — the form to BIN on (calibration, thresholding): integer
    * bin edges cannot suffer the reconstruct-from-double ulp that
    * `round(score * 1e6)` risks. */
  def hashedLinearScoreMicro(text: Column, weightsMicro: Seq[Long]): Column = {
    val d = weightsMicro.size
    require(d > 0, "weight table must be non-empty")
    val table = typedLit(weightsMicro)
    aggregate(
      transform(tokens(normalizeText(text)),
        t => element_at(table,
          pmod(Dedup.portableTokenHash(t), lit(d.toLong)).cast("int") + 1)),
      lit(0L), (acc, w) => acc + w)
  }

  /** Quality features per document. Ratios are single IEEE divisions of
    * exact integer counts → bit-reproducible across engines. */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_chars", length(t).cast("long"))
      .withColumn("n_tokens", tokenCount(t).cast("long"))
      .withColumn("n_punct", punctCount(t).cast("long"))
      .withColumn("n_stopwords",
        stopwordCount(t, stopwordProfiles.flatMap(_._2)).cast("long"))
      .withColumn("avg_token_len",
        when(col("n_tokens") > 0,
          (col("n_chars") - col("n_tokens") + 1).cast("double") / col("n_tokens"))
          .otherwise(lit(0.0)))
      .withColumn("stopword_ratio",
        when(col("n_tokens") > 0,
          col("n_stopwords").cast("double") / col("n_tokens")).otherwise(lit(0.0)))
      .withColumn("punct_ratio",
        when(col("n_chars") > 0,
          col("n_punct").cast("double") / col("n_chars")).otherwise(lit(0.0)))
  }

  /** Bigram language-model quality score — the CCNet-style "score docs by
    * a reference LM" filter, made exactly reproducible: the model is the
    * conditional bigram frequency table of a REFERENCE corpus, each
    * probability quantized to integer millionths (`floor(1e6·c(ab)/c(a·))`
    * — both operands are exact integers and the product stays under 2⁵³,
    * so the IEEE division and floor are bit-identical in any engine), and
    * a document's score is the exact integer sum of its bigram instances'
    * quantized probabilities divided once at the end. Unseen bigrams score
    * zero. Documents with fewer than two tokens are absent (no bigrams to
    * score).
    *
    * Scale shape: the model is a broadcast parameter, like the vocabulary
    * and quality-model weights — reference corpora for LM filtering are
    * curated slices (Wikipedia-sized), not the 100-TB corpus itself, and
    * its conditional table is vocabulary-bounded. Scoring is one explode +
    * one broadcast join + one map-side-combined aggregate; a hot bigram
    * never co-locates (the join probes a broadcast). */
  def bigramLmScore(
      docs: DataFrame, idCol: String, textCol: String,
      ref: DataFrame, refTextCol: String,
      quantum: Long = 1000000L): DataFrame = {
    // two-step selects: the bigram expression references the token array
    // several times — inlining the tokenizer would re-split the text once
    // per bigram position (see Dedup.ngramJaccardPairs' inlining caveat)
    val refBi = ref
      .select(tokens(normalizeText(col(refTextCol))).as("__toks"))
      .select(explode(tokenNgrams(col("__toks"), 2)).as("bigram"))
    val biCounts = refBi.groupBy("bigram").agg(count(lit(1)).as("__c_ab"))
      .withColumn("__w1", substring_index(col("bigram"), " ", 1))
    val prefCounts = biCounts.groupBy("__w1").agg(sum("__c_ab").as("__c_a"))
    val model = biCounts.join(prefCounts, "__w1")
      .select(col("bigram"),
        floor(lit(quantum) * col("__c_ab") / col("__c_a")).cast("long").as("__q"))
    val docBi = docs
      .select(col(idCol), tokens(normalizeText(col(textCol))).as("__toks"))
      .select(col(idCol), explode(tokenNgrams(col("__toks"), 2)).as("bigram"))
    docBi.join(broadcast(model), Seq("bigram"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(coalesce(col("__q"), lit(0L))).as("sum_q"))
      .withColumn("lm_score",
        col("sum_q").cast("double") / col("n_bigrams") / quantum)
  }
}
