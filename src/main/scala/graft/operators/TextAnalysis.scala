package graft.operators

import graft.analyzers.Analyzers
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines, over the
  * driver's `documents` table (doc_id, text, lang, source, n_chars).
  *
  * Everything here is a per-row Column pipeline built from codegen'd
  * built-ins — no UDF, no shuffle except where an aggregation is the
  * operator's semantics (top-n-grams). At 100 TB each of these runs as a
  * single narrow map stage over the parquet scan with full column pruning:
  * only `doc_id`/`text` are read.
  *
  * The reference has no corpus-analysis surface (its text analysis lives in
  * the ES analyzers, reference: data_catalog/configuration_const.py:21-84);
  * these operators extend the same tokenizer machinery (graft.analyzers) to
  * the document-pipeline capabilities the north star asks for.
  */
object TextAnalysis {

  /** Standard-analyzer tokens of the document text. */
  def tokens(text: Column): Column = Analyzers.standardTokens(text)

  // ------------------------------------------------------------ token stats

  /** Token counting: total, distinct, and English-stopword token counts. */
  def tokenStats(docs: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    docs.select(
      col("doc_id"),
      size(t).as("n_tokens"),
      size(array_distinct(t)).as("n_distinct"),
      size(filter(t, w => w.isInCollection(Analyzers.EnglishStopwords))).as("n_stopwords")
    )
  }

  // -------------------------------------------------------------- language ID

  /** Tiny function-word profiles (public-knowledge closed-class words). The
    * heuristic is the classic stopword-overlap language identifier: score a
    * language by how many of the document's tokens are that language's
    * function words; argmax with a fixed precedence order (en, es, de, fr)
    * for determinism.
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "is", "and", "of", "to", "in", "that", "it", "with",
      "as", "for", "was", "on", "are", "at", "a"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "se", "no",
      "por", "con", "para", "los", "las"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "mit", "den",
      "nicht", "ein", "zu", "auf"),
    "fr" -> Seq("le", "les", "de", "et", "une", "est", "que", "pour", "dans",
      "sur", "pas", "ce")
  )

  /** (predicted_lang, lang_score) columns over a token-array expression —
    * exposed so composed pipelines fuse the gate into one narrow stage.
    */
  private[operators] def langCols(t: Column): (Column, Column) = {
    val scores = LangProfiles.map { case (lang, words) =>
      lang -> size(filter(t, w => w.isInCollection(words)))
    }
    val Seq(en, es, de, fr) = scores.map(_._2)
    val predicted =
      when(en >= es && en >= de && en >= fr && en > 0, "en")
        .when(es >= de && es >= fr && es > 0, "es")
        .when(de >= fr && de > 0, "de")
        .when(fr > 0, "fr")
        .otherwise("unknown")
    (predicted, greatest(en, es, de, fr).cast("long"))
  }

  /** READABILITY score — Flesch reading ease (Flesch 1948), the classic
    * "how hard is this text" gate a curation pipeline runs beside the
    * quality blend (t2 rewards length/vocabulary; this penalizes long
    * sentences and polysyllabic words — different axis, different
    * failures):
    *
    *   206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)
    *
    * carried as EXACT INTEGER MICROS: flesch_e6 = 206835000 −
    * (1015000·W) div S − (84600000·Y) div W — each division's operands
    * are non-negative (floor ≡ trunc, the portable form) and the final
    * subtraction is exact long arithmetic, so both engines agree
    * bit-for-bit even on the negative scores real tangled text
    * produces. Deterministic structural counts, no NLP dependency:
    * W = standard tokens, S = non-blank `[.!?]+`-separated segments
    * (min 1 — headline-style text is one sentence, not zero),
    * Y = vowel-group runs `[aeiouy]+` of the lowered text (the standard
    * syllable heuristic — a run can't span a word boundary, so no
    * tokenization needed). A tokenless doc reports null score/band.
    * Bands read off the integer at the published 60/30 thresholds.
    *
    * Plan: ONE codegen'd narrow pass, no shuffle, no join — the same
    * shape as t2/t24, ingest-time cheap at any scale. Output:
    * `(doc_id, n_words, n_sentences, n_syllables, flesch_e6, band)`
    * ordered by doc_id.
    */
  def readability(docs: DataFrame): DataFrame = {
    val w = size(tokens(col("text"))).cast("long")
    val s = greatest(lit(1L),
      size(filter(split(col("text"), "[.!?]+", -1),
        x => trim(x) =!= "")).cast("long"))
    val y = size(regexp_extract_all(lower(col("text")),
      lit("[aeiouy]+"), lit(0))).cast("long")
    docs.select(col("doc_id"), w.as("n_words"), s.as("n_sentences"),
        y.as("n_syllables"))
      .withColumn("flesch_e6", when(col("n_words") > 0,
        expr("206835000L - (1015000L * n_words) DIV n_sentences" +
          " - (84600000L * n_syllables) DIV n_words")))
      .withColumn("band", when(col("n_words") === 0, lit(null).cast("string"))
        .when(col("flesch_e6") >= 60000000L, "easy")
        .when(col("flesch_e6") >= 30000000L, "medium")
        .otherwise("hard"))
      .orderBy("doc_id")
  }

  /** Language-ID: (doc_id, predicted_lang, lang_score). `lang_score` is the
    * winning profile's function-word hit count.
    */
  def langId(docs: DataFrame): DataFrame = {
    val (predicted, best) = langCols(tokens(col("text")))
    docs.select(col("doc_id"), predicted.as("predicted_lang"),
      best.as("lang_score"))
  }

  /** Per-source LANGUAGE-MIX report — the multilingual-composition audit a
    * mix planner reads next to [[Pipeline.mixtureEpochPlan]]: for every
    * (source, predicted language) cell, document count and the share of
    * the source in exact floor-divided micros. "unknown" rows stay
    * visible (a source full of unidentifiable text is a data problem,
    * not a rounding detail). One lang-ID projection + one
    * map-side-combining aggregate; per-source totals are a
    * |sources|-scale join back.
    */
  def languageMix(docs: DataFrame): DataFrame = {
    val (predicted, _) = langCols(tokens(col("text")))
    val perCell = docs.select(col("source"), predicted.as("predicted_lang"))
      .groupBy("source", "predicted_lang")
      .agg(count(lit(1)).as("n_docs"))
    val totals = perCell.groupBy("source").agg(sum("n_docs").as("n_src"))
    perCell.join(broadcast(totals), "source")
      .withColumn("share_e6", expr("(n_docs * 1000000) DIV n_src"))
      .select("source", "predicted_lang", "n_docs", "share_e6")
      .orderBy("source", "predicted_lang")
  }

  // ---------------------------------------------------------- quality score

  /** Quality scoring: a deterministic blend of length, stopword ratio, and
    * lexical diversity (the standard cheap pre-training quality gates).
    * quality = 0.4·min(1, n_tokens/100) + 0.3·stopword_ratio + 0.3·distinct_ratio,
    * rounded to 6 decimals. Empty docs score 0.
    */
  def qualityScore(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), qualityCol(tokens(col("text"))).as("quality"))

  /** The quality blend over a token-array expression (see [[qualityScore]]).
    *
    * Computed in EXACT integer arithmetic, not floats: the blend reduces to
    * one rational, (2·min(nt,100)·nt + 150·(ns+nd)) / (500·nt), and its
    * HALF_UP 6-decimal rounding is `(10⁶·num + den/2) div den` — pure
    * integer ops every engine reproduces bit-for-bit. A float formulation
    * diverges cross-engine when a score lands on a .5e-6 boundary: Spark's
    * round() is exact HALF_UP on the binary value while engines that
    * multiply by 10⁶ first (DuckDB) can tip the other way — observed on 1
    * of 5000 docs at sf0.1. Evaluated by the native
    * [[graft.functions.QualityMicrosExpr]] kernel (hash-set stopword and
    * distinct counting in one codegen'd loop — the declarative filter/
    * isInCollection twin is interpreted with a linear stopword scan per
    * token; value parity spec-pinned in TokenizeExprSpec), then divided to
    * a double: micros ≤ 10⁶ and the all-long kernel division is exact to
    * ~1.8×10¹⁰ tokens/doc.
    */
  private[operators] def qualityCol(t: Column): Column =
    qualityMicrosCol(t).cast("double") / 1e6

  /** HALF_UP 6-decimal rounding of num/den (non-negative longs, den > 0) in
    * EXACT integer arithmetic: (10⁶·num + ⌊den/2⌋) div den, then /10⁶.
    * Engine-portable where float `round(num/den, 6)` is not (see
    * [[qualityCol]]'s scaladoc); exact while 10⁶·num ≤ 2⁵³.
    */
  private[operators] def roundDiv6(num: Column, den: Column): Column = {
    val scaled = lit(1000000L) * num + shiftright(den, 1)
    (scaled - pmod(scaled, den)).cast("double") / den.cast("double") / 1e6
  }

  /** The quality blend's exact 6-decimal MICROS integer (quality ≡
    * micros/10⁶, micros ∈ [0, 10⁶] since the blend is ≤ 1), as a LONG for
    * callers that need the score as an integer — e.g.
    * [[Pipeline.weightedSample]]'s coin comparison, which must be exact
    * integer-vs-integer so every engine makes the identical keep/drop
    * decision. Backed by the native kernel (see [[qualityCol]]); a NULL
    * token array coalesces to 0 — the pre-kernel `when(nTok > 0)`
    * behavior, which consumers like [[Quality.qualityDrift]]'s bucket
    * spine rely on (a null-text row must land in bucket 0, not in a
    * NULL bucket the spine join would silently drop).
    */
  private[operators] def qualityMicrosCol(t: Column): Column =
    coalesce(graft.functions.Tokenize.qualityMicros(t, Analyzers.EnglishStopwords),
      lit(0L))

  // ---------------------------------------------- BPE-ish pre-tokenization

  /** Whitespace as an explicit character class, NOT `\s`: java.util.regex
    * counts vertical tab in `\s`, RE2 (DuckDB) does not — an explicit
    * `[ \t\n\r]` class means every engine tokenizes identically.
    */
  val WsClass: String = " \\t\\n\\r"

  /** GPT-2-style pre-tokenizer pattern, simplified to syntax every regex
    * engine (java.util.regex, RE2) agrees on: contractions, letter runs,
    * digit runs, punctuation runs — each with an optional leading space.
    * Applied to lowercased text.
    */
  val BpePattern: String = s"'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9$WsClass]+"

  /** Token counting, tokenizer-family comparison: whitespace-delimited words
    * vs BPE-ish pre-tokens. Both counted via `regexp_extract_all` with a
    * literal pattern (compiled once and cached — `split` recompiles its regex
    * per row, the UTF8String.split hazard).
    */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(regexp_extract_all(col("text"), lit(s"[^$WsClass]+"), lit(0))).as("n_ws_tokens"),
      size(regexp_extract_all(lower(col("text")), lit(BpePattern), lit(0))).as("n_bpe_tokens"))

  // ------------------------------------------------------------ corpus stats

  /** Corpus-level report: document count, total/mean/median/min/max token
    * counts — the summary every pipeline prints before training. One partial+
    * final aggregate over the token-count projection (map-side combined, a
    * single scalar row out — the 100 TB-safe aggregation shape). Median is
    * the standard linear-interpolated percentile; mean/median round to 6 for
    * cross-engine comparability.
    */
  def corpusStats(docs: DataFrame): DataFrame =
    docs.select(size(tokens(col("text"))).as("n"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n")).as("total_tokens"),
        round(avg(col("n")), 6).as("mean_tokens"),
        round(expr("percentile(n, 0.5)"), 6).as("median_tokens"),
        // long-cast: size() is int32, but every cross-engine consumer of a
        // token COUNT speaks int64 (DuckDB len() is BIGINT)
        min(col("n")).cast("long").as("min_tokens"),
        max(col("n")).cast("long").as("max_tokens"))

  /** Corpus-unigram cross-entropy per document — the perplexity-proxy
    * quality signal (a doc whose tokens are improbable under the corpus's
    * own unigram distribution is noise: mojibake, code dumps, lists of
    * ids), used for perplexity filtering when no external LM is available.
    * Output `(doc_id, xent)` with xent = Σ c(t)·−ln p(t) / Σ c(t) over the
    * doc's tokens, p(t) the corpus-wide unigram frequency, rounded to 4 dp
    * for cross-engine comparability (see the rounding rationale below).
    *
    * Shuffle plan, sized for 100 TB: per-doc token counts compress the
    * exploded stream with a map-side-combining aggregate BEFORE anything
    * joins — the join to the vocabulary table is then (docs×distinct-tokens)
    * rows against a vocab-sized side, co-shuffled on the token (stopword
    * skew is AQE's bread and butter); the grand total rides along as a
    * broadcast 1-row aggregate. Nothing driver-side, no second scan of the
    * raw text (`tc` is reused by reference for the vocabulary).
    *
    * Rounded at 4 decimals, not 6: unlike the pure-rational scores
    * ([[qualityCol]]'s exact-integer trick), a many-term sum of natural
    * logs carries float noise — summation order varies with shuffle
    * arrival, and JVM vs libm `ln` may differ in the last ulp — so the
    * rounding grid sits two orders of magnitude above that noise floor
    * instead of adjacent to it.
    */
  def unigramLm(docs: DataFrame): DataFrame = {
    val tc = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
    val vocab = tc.groupBy("tok").agg(sum("c").as("vc"))
    val total = vocab.agg(sum("vc").cast("double").as("n"))
    tc.join(vocab, "tok")
      .crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(round(sum(col("c") * -log(col("vc") / col("n"))) / sum(col("c")), 4).as("xent"))
  }

  /** Per-document BIGRAM cross-entropy under the corpus conditional-bigram
    * distribution — [[unigramLm]]'s sharper sibling (fluency, not just
    * vocabulary: p(w₂|w₁) = C(w₁w₂)/C(w₁·) punishes improbable SEQUENCES
    * that unigram frequency cannot see; the pair the two scores make is
    * the classic cheap perplexity-proxy quality filter). MLE is exact
    * here — every document's bigrams are in the corpus tables by
    * construction, so no smoothing is needed and the score is closed-form
    * for the oracle. Documents with fewer than two tokens have no bigrams
    * and drop (they carry no sequence signal; [[unigramLm]] covers them).
    *
    * Plan shape at 100 TB: bigram counts and prefix totals are two
    * map-side-combining aggregates over the same narrow n-gram pass; the
    * scoring join co-shuffles on the bigram key — the t11 discipline one
    * n-gram order up.
    */
  def bigramLm(docs: DataFrame): DataFrame = {
    val bc = graft.util.Spread.byKey(
        docs.select(col("doc_id"), col("text")), col("doc_id"))
      .select(col("doc_id"), explode(ngrams(tokens(col("text")), 2)).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
    val corpus = bc.groupBy("bg").agg(sum("c").as("bcnt"))
      .withColumn("w1", element_at(split(col("bg"), " "), 1))
    val prefix = corpus.groupBy("w1").agg(sum("bcnt").as("pc"))
    bc.join(corpus, "bg").join(prefix, "w1")
      .groupBy("doc_id")
      .agg(round(sum(col("c") * -log(col("bcnt").cast("double") / col("pc"))) / sum(col("c")), 4)
        .as("xent2"))
  }

  /** Per-document TRIGRAM cross-entropy under an interpolated KNESER-NEY
    * model — the published corpus-quality signal beside [[unigramLm]] /
    * [[bigramLm]]'s MLE forms (CCNet-style filtering scores documents
    * under a SMOOTHED higher-order LM; MLE trigram probabilities would be
    * spiky and assign everything-it-has-seen probability mass 1 at the
    * tail). Fixed absolute discount D = 0.75 — the textbook value, exactly
    * representable in binary so both engines evaluate the identical
    * double — with every lower-order statistic derived from the TRIGRAM
    * TYPE table by the standard KN continuation-count convention:
    *
    *   P(w₃|w₁w₂) = (max(c₁₂₃ − D, 0) + D·N₁₊(w₁w₂•)·P(w₃|w₂)) / c₁₂•
    *   P(w₃|w₂)   = (max(N₁₊(•w₂w₃) − D, 0) + D·N₁₊(w₂•)·P꜀(w₃)) / N₁₊(•w₂•)
    *   P꜀(w₃)     = N₁₊(•w₃) / N₁₊(••)
    *
    * Every denominator is ≥ 1 by construction — a scored trigram is itself
    * a corpus trigram type, so its context total, middle continuation
    * total, and the global type count all count it — hence no zero-count
    * escape is needed and the score is closed-form for the oracle.
    * Documents with fewer than three tokens drop (no trigram signal;
    * t11/t16 cover them). Score: xent3 = Σc·(−ln P) / Σc, round-4 — the
    * t11 output discipline.
    *
    * Plan shape at 100 TB: the trigram-type table is one map-side-
    * combining aggregate off the narrow n-gram pass; the four lower-order
    * statistic tables (context, continuation-bigram, middle, unigram-
    * continuation) are successively smaller re-aggregates of it; scoring
    * co-shuffles doc trigrams with the type table on the trigram key and
    * picks up the statistics on their own keys — the t16 discipline one
    * n-gram order up, nothing driver-side, one broadcast 1-row total.
    */
  def trigramLmKN(docs: DataFrame): DataFrame = {
    val dD = lit(0.75)
    // r17: spread the raw text so tokenize+explode run parallel (the
    // withShingles argument); the aggregates keep their own map-side-
    // combining exchanges (a keyed pre-spread of RAW occurrences was
    // measured 2x WORSE — it ships every occurrence string uncombined)
    val tg = graft.util.Spread.byKey(
        docs.select(col("doc_id"), col("text")), col("doc_id"))
      .select(col("doc_id"), explode(ngrams(tokens(col("text")), 3)).as("tg"))
      .groupBy("doc_id", "tg").agg(count(lit(1)).as("c"))
    val tri = tg.groupBy("tg").agg(sum("c").as("tcnt"))
      .withColumn("p", split(col("tg"), " "))
      .select(col("tg"), col("tcnt"), element_at(col("p"), 1).as("w1"),
        element_at(col("p"), 2).as("w2"), element_at(col("p"), 3).as("w3"))
    val ctx = tri.groupBy("w1", "w2")
      .agg(sum("tcnt").as("ccnt"), count(lit(1)).as("nctx"))
    val cont = tri.groupBy("w2", "w3").agg(count(lit(1)).as("cont23"))
    val mid = cont.groupBy("w2")
      .agg(sum("cont23").as("midtot"), count(lit(1)).as("fwd2"))
    val uni = tri.groupBy("w3").agg(count(lit(1)).as("ucont"))
    val tot = tri.agg(count(lit(1)).cast("double").as("ntypes"))
    // association order mirrors the oracle SQL verbatim — the round-4
    // absorbs partial-sum reorder, not expression-shape divergence
    val pcont = col("ucont").cast("double") / col("ntypes")
    val p2 = (greatest(col("cont23").cast("double") - dD, lit(0d)) +
      dD * col("fwd2").cast("double") * pcont) / col("midtot").cast("double")
    val p3 = (greatest(col("tcnt").cast("double") - dD, lit(0d)) +
      dD * col("nctx").cast("double") * p2) / col("ccnt").cast("double")
    tg.join(tri, "tg").join(ctx, Seq("w1", "w2")).join(cont, Seq("w2", "w3"))
      .join(mid, Seq("w2")).join(uni, Seq("w3"))
      .crossJoin(broadcast(tot))
      .groupBy("doc_id")
      .agg(round(sum(col("c") * -log(p3)) / sum(col("c")), 4).as("xent3"))
  }

  /** KATZ-BACKOFF trigram cross-entropy over a HELD-OUT corpus —
    * [[trigramLmKN]]'s spec-distinct twin and the deployment shape the
    * KN entry cannot exercise: the model TRAINS on one corpus and scores
    * ANOTHER (the CCNet quality-scoring deployment — perplexity of new
    * data under a frozen reference LM), so unseen trigrams, unseen
    * contexts, unseen bigrams, and out-of-vocabulary words all occur and
    * every backoff path is LIVE. The two smoothing families differ
    * structurally, which is what earns the twin its keep: KN
    * INTERPOLATES lower orders into every probability (continuation
    * counts always contribute); Katz BACKS OFF — a seen trigram's
    * probability is pure discounted MLE `(c₁₂₃ − D)/c₁₂` touching no
    * lower order, and the lower orders carry exactly the leftover mass:
    *
    *   P(w₃|w₁w₂) = (c₁₂₃ − D)/c₁₂                       if c₁₂₃ > 0
    *              = α(w₁w₂) · P(w₃|w₂)                   if c₁₂ > 0
    *              = P(w₃|w₂)                             (unseen context)
    *   P(w₃|w₂)   = (c₂₃ − D)/c₂                         if c₂₃ > 0
    *              = α(w₂) · P₁(w₃)                       if c₂ > 0
    *              = P₁(w₃)                               (unseen middle)
    *   P₁(w₃)     = (c(w₃) + 1)/(N + V + 1)              (Laplace floor — OOV lives)
    *
    * D = 3/4 fixed (exactly binary-representable — the t31 discipline);
    * every backoff weight reduces to a FIXED float shape over exact
    * integer sums — the classic Σ_seen(c−D) telescopes:
    * α(w₁w₂) = (n₁₂·D/c₁₂) / (1 − (s₂₃ − n₁₂·D)/c₂) with s₂₃ the exact
    * integer Σ of the seen continuations' bigram counts, and
    * α(w₂) = (n₂·D/c₂) / (1 − (s₂ + n₂)/(N+V+1)) likewise — no
    * order-dependent float sum exists outside the final per-doc fold
    * (absorbed by round-4, the t11 rule). Every denominator is strictly
    * positive by construction (s₂₃ ≤ c₂ and n₁₂·D > 0; s₂ ≤ N, n₂ ≤ V).
    * All lower-order counts derive from the ONE trigram occurrence
    * table (consistent denominators: Σ_w₃ c₂₃ = c₂ exactly). Docs under
    * three tokens drop (the t31 rule).
    *
    * Plan shape: the t31 discipline — train tables are successively
    * smaller re-aggregates of one map-side-combining trigram aggregate;
    * scoring co-shuffles held-out doc trigrams with the type table on
    * the trigram key and picks up each statistic on its own key; one
    * broadcast 1-row total; nothing driver-side.
    */
  def trigramLmKatz(train: DataFrame, score: DataFrame): DataFrame = {
    val dD = lit(0.75)
    val tri = train.select(tokens(col("text")).as("t"))
      .select(explode(ngrams(col("t"), 3)).as("tg"))
      .groupBy("tg").agg(count(lit(1)).as("c3"))
      .withColumn("p", split(col("tg"), " "))
      .select(col("c3"), element_at(col("p"), 1).as("w1"),
        element_at(col("p"), 2).as("w2"), element_at(col("p"), 3).as("w3"))
    val c23 = tri.groupBy("w2", "w3").agg(sum("c3").as("c23"))
    val c2t = c23.groupBy("w2").agg(sum("c23").as("c2"), count(lit(1)).as("n2"))
    val uni = tri.groupBy("w3").agg(sum("c3").as("u3"))
    val tot = uni.agg(sum("u3").as("uu"), count(lit(1)).as("vv"))
    val ctx = tri.join(c23, Seq("w2", "w3"))
      .groupBy("w1", "w2")
      .agg(sum("c3").as("c12"), count(lit(1)).as("n12"), sum("c23").as("s23"))
    val s2t = c23.join(uni, Seq("w3")).groupBy("w2").agg(sum("u3").as("s2"))
    val dtri = score.select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"), explode(ngrams(col("t"), 3)).as("tg"))
      .groupBy("doc_id", "tg").agg(count(lit(1)).as("c"))
      .withColumn("p", split(col("tg"), " "))
      .select(col("doc_id"), col("c"), element_at(col("p"), 1).as("w1"),
        element_at(col("p"), 2).as("w2"), element_at(col("p"), 3).as("w3"))
    // association order mirrors the oracle SQL verbatim (the t31 rule)
    val pu = (coalesce(col("u3"), lit(0L)).cast("double") + lit(1.0)) /
      (col("uu").cast("double") + col("vv") + lit(1.0))
    val alpha2 = (col("n2").cast("double") * dD / col("c2")) /
      (lit(1.0) - (col("s2").cast("double") + col("n2")) /
        (col("uu").cast("double") + col("vv") + lit(1.0)))
    val pbo2 = when(col("c23").isNotNull,
        (col("c23").cast("double") - dD) / col("c2"))
      .when(col("c2").isNotNull, alpha2 * pu)
      .otherwise(pu)
    val alpha12 = (col("n12").cast("double") * dD / col("c12")) /
      (lit(1.0) - (col("s23").cast("double") - col("n12") * dD) / col("c2"))
    val pKatz = when(col("c3").isNotNull,
        (col("c3").cast("double") - dD) / col("c12"))
      .when(col("c12").isNotNull, alpha12 * pbo2)
      .otherwise(pbo2)
    dtri
      .join(tri, Seq("w1", "w2", "w3"), "left")
      .join(ctx, Seq("w1", "w2"), "left")
      .join(c23, Seq("w2", "w3"), "left")
      .join(c2t, Seq("w2"), "left")
      .join(s2t, Seq("w2"), "left")
      .join(uni, Seq("w3"), "left")
      .crossJoin(broadcast(tot))
      .groupBy("doc_id")
      .agg(round(sum(col("c") * -log(pKatz)) / sum(col("c")), 4).as("xent3_katz"))
  }

  /** ENCODING-corruption gate — the mojibake/byte-damage filter every
    * web-scale ingest runs before any content gate can be trusted (a
    * double-encoded or truncated-UTF-8 document scores plausibly on
    * length/stopword blends while being garbage): per document the
    * REPLACEMENT-character count (U+FFFD — the decoder already admitted
    * damage), the C0 control-character count (except \t \n \r — binary
    * leaking into text), and the classic UTF-8-as-Latin-1 double-encoding
    * markers — 'Ã' ONLY when followed by a Latin-1-supplement
    * continuation char (U+0080–U+00BF: the second byte of a
    * double-decoded UTF-8 pair, the signature of é→Ã©), since a bare 'Ã'
    * is legitimate Latin text ("SÃO PAULO" must not flag), plus the 'â€'
    * digraph head (”→â€�-class damage). Badness in floor-div ppm of the character
    * count, flag at > 1000 ppm, empty documents null ppm ("unmeasurable"
    * never aliases "clean"). All four counts are regex occurrence counts
    * over one narrow codegen'd pass — no shuffle, no UDF; the classes
    * are pinned to the RE2 ∩ java.util.regex common subset so both
    * engines count identically.
    */
  def encodingProfile(docs: DataFrame): DataFrame = {
    def cnt(pattern: String): Column =
      size(regexp_extract_all(col("text"), lit(pattern), lit(0))).cast("long")
    docs.select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        cnt("\\ufffd").as("n_replacement"),
        cnt("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]").as("n_control"),
        cnt("\\u00c3[\\u0080-\\u00bf]|\\u00e2\\u20ac").as("n_mojibake"))
      .withColumn("bad_ppm",
        when(col("n_chars") > 0,
          expr("(n_replacement + n_control + n_mojibake) * 1000000 DIV n_chars")))
      .withColumn("flagged", coalesce(col("bad_ppm") > 1000L, lit(false)))
      .orderBy("doc_id")
  }

  /** One combine-safe partial row of the CORPUS encoding-health
    * statistics — the aggregate face of [[encodingProfile]] (which stays
    * per-document): doc/flag counts and the four damage-class totals,
    * every column an order-free integer SUM, so the streamed fold (e39)
    * lands one row per micro-batch and [[encodingReport]] over the
    * folded rows equals the batch report by construction (the e34/e35
    * shared-stage rule). The per-doc `flagged` bit is batch-local —
    * a document lives entirely in its batch — so its count is mergeable
    * too.
    */
  def encodingPartials(docs: DataFrame): DataFrame =
    encodingProfile(docs).agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("flagged"), 1L).otherwise(0L)).as("n_flagged"),
      sum("n_chars").as("n_chars"),
      sum("n_replacement").as("n_replacement"),
      sum("n_control").as("n_control"),
      sum("n_mojibake").as("n_mojibake"))

  /** Merge [[encodingPartials]] rows (one, or a folded log's many) into
    * the corpus encoding-health report — totals plus corpus badness in
    * floor-div ppm (DECIMAL-widened product: damage-count · 10⁶ at
    * corpus scale brushes a long), null when no characters exist
    * ("unmeasurable" never aliases "clean", the t32 rule).
    */
  def encodingReport(partials: DataFrame): DataFrame =
    partials.agg(
      coalesce(sum("n_docs"), lit(0L)).as("n_docs"),
      coalesce(sum("n_flagged"), lit(0L)).as("n_flagged"),
      coalesce(sum("n_chars"), lit(0L)).as("n_chars"),
      coalesce(sum("n_replacement"), lit(0L)).as("n_replacement"),
      coalesce(sum("n_control"), lit(0L)).as("n_control"),
      coalesce(sum("n_mojibake"), lit(0L)).as("n_mojibake"))
    .withColumn("bad_ppm", when(col("n_chars") > 0,
      expr("CAST(n_replacement + n_control + n_mojibake AS DECIMAL(38,0))" +
        " * 1000000 DIV n_chars")))

  /** Per-source corpus profile: documents, token volume, and EXACT distinct
    * vocabulary per source — the per-domain report a mixing recipe is tuned
    * against. Two-level aggregation: (source, token) partial-counts map-side
    * first, so the second, tiny aggregate sees one row per distinct pair —
    * the standard exact-distinct shape. At 100 TB the exact count is a real
    * shuffle of distinct pairs; [[approxDistinctProfile]] is the sketch
    * path (HyperLogLog++, one pass, mergeable, no second shuffle) — same
    * schema, spec-pinned within its error bound of this exact profile.
    */
  def distinctProfile(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("source"), explode(tokens(col("text"))).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
    val docsBySrc = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
    docsBySrc.join(
        tok.groupBy("source").agg(sum("c").as("n_tokens"),
          count(lit(1)).as("n_distinct")), "source")
      .select("source", "n_docs", "n_tokens", "n_distinct")
  }

  /** Sketch twin of [[distinctProfile]]: HyperLogLog++ distinct estimate,
    * single pass, mergeable across shards — the 100 TB default when a ~2%
    * relative error is acceptable. Not oracle-gated (no engine reproduces
    * another's sketch); spec-pinned within rsd bounds of the exact profile.
    */
  def approxDistinctProfile(docs: DataFrame, rsd: Double = 0.02): DataFrame =
    docs.select(col("source"), explode(tokens(col("text"))).as("tok"))
      .groupBy("source").agg(count(lit(1)).as("n_tokens"),
        approx_count_distinct(col("tok"), rsd).as("n_distinct_approx"))

  /** Per-source document-LENGTH distribution profile: exact interpolated
    * percentiles of the per-document token count — the distributional
    * report that drives truncation limits, packing budgets, and outlier
    * screens (a corpus whose p99 is 50× its median needs different
    * handling than a tight one). Interpolation is the standard
    * rank = q·(n−1) linear rule, matching every SQL engine's
    * percentile_cont / quantile_cont — the oracle holds the values exactly.
    *
    * At 100 TB the EXACT percentile buffers each group's values — a real
    * per-source memory bill once sources hold billions of documents;
    * [[lengthProfileApprox]] is the sketch path (Spark's bounded-memory
    * approx_percentile aggregate, one pass, mergeable partials) — same
    * schema, spec-pinned within its rank-error bound of this exact profile
    * (the t12 exact/HLL discipline, applied to quantiles).
    */
  def lengthProfile(docs: DataFrame): DataFrame =
    docs.select(col("source"), size(tokens(col("text"))).cast("long").as("n_tok"))
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        round(expr("percentile(n_tok, 0.25)"), 6).as("p25"),
        round(expr("percentile(n_tok, 0.5)"), 6).as("p50"),
        round(expr("percentile(n_tok, 0.75)"), 6).as("p75"),
        round(expr("percentile(n_tok, 0.9)"), 6).as("p90"),
        max("n_tok").as("max_tok"))

  /** Sketch twin of [[lengthProfile]]: `approx_percentile` (Greenwald-
    * Khanna style summary, memory bounded by `accuracy`, mergeable across
    * shards). Returns the same quantile columns as exact values from the
    * summary — guaranteed within 1/accuracy rank error; not oracle-gated
    * (no engine reproduces another's summary), spec-pinned against the
    * exact profile.
    */
  def lengthProfileApprox(docs: DataFrame, accuracy: Int = 10000): DataFrame =
    docs.select(col("source"), size(tokens(col("text"))).cast("long").as("n_tok"))
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        expr(s"approx_percentile(n_tok, array(0.25, 0.5, 0.75, 0.9), $accuracy)")
          .as("quantiles"),
        max("n_tok").as("max_tok"))

  /** Per-document TF·IDF keyword extraction: the `k` most characteristic
    * terms of each document — tfidf(t, d) = c(t, d) · ln(N / df(t)), df the
    * DOCUMENT frequency (distinct docs containing t), ties broken
    * (score desc, term asc) for determinism. The corpus-summarization /
    * tagging primitive (and the features a sparse-vector search feeds on).
    *
    * Shuffle plan at 100 TB: per-doc term counts compress the exploded
    * stream with a map-side-combining aggregate FIRST; the df table is a
    * second aggregate over the same (doc, term)-level rows (one row per
    * distinct pair — already compressed); the score join co-shuffles on
    * the term with AQE covering stopword skew; the corpus size rides as a
    * broadcast 1-row aggregate; per-doc top-k is a WindowGroupLimit
    * partial. No driver action, one scan of the text.
    */
  def keywords(docs: DataFrame, k: Int = 3): DataFrame = {
    val tc = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
    val df = tc.groupBy("tok").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).cast("double").as("n"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tfidf").desc, col("tok").asc)
    tc.join(df, "tok")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("tok"),
        round(col("c") * log(col("n") / col("df")), 6).as("tfidf"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("rank").cast("long").as("rank"),
        col("tok").as("term"), col("tfidf"))
  }

  /** "More like this" — the similar-document query of the reference's
    * search lineage (Elasticsearch's more_like_this, deterministically
    * simplified): the seed document's `kTerms` highest-TF·IDF terms
    * ([[keywords]]' selection rule, same rounding and tie-break) become
    * the query, every other document scores Σ c(term, doc) · idf(term)
    * over those terms, top-k returned by (score desc, doc_id). The
    * "find related datasets / near-topic documents" primitive that
    * complements embedding search with a sparse, explainable signal.
    *
    * Plan shape at 100 TB: term counts and dfs are the t13 aggregates;
    * the seed's term set is kTerms rows — a broadcast — so scoring is one
    * co-shuffled aggregate over the MATCHING (doc, term) rows only
    * (documents sharing no seed term never enter the aggregate), and the
    * top-k is a per-partition TakeOrdered merge, not a global sort.
    */
  def moreLikeThis(docs: DataFrame, seedDocId: Long,
                   kTerms: Int = 5, k: Int = 10): DataFrame = {
    val tc = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
    val dfr = tc.groupBy("tok").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).cast("double").as("n"))
    val seedTerms = tc.where(col("doc_id") === seedDocId)
      .join(dfr, "tok").crossJoin(broadcast(n))
      .select(col("tok"), round(col("c") * log(col("n") / col("df")), 6).as("w"),
        log(col("n") / col("df")).as("idf"))
      .orderBy(col("w").desc, col("tok").asc).limit(kTerms)
      .select("tok", "idf")
    tc.where(col("doc_id") =!= seedDocId)
      .join(broadcast(seedTerms), "tok")
      .groupBy("doc_id").agg(round(sum(col("c") * col("idf")), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(k)
      .select(col("doc_id"), col("score"))
  }

  // ----------------------------------------------------------- fingerprints

  /** Canonical content fingerprint: md5 over the normalized token stream.
    * Whitespace/punctuation/case changes don't perturb it — the cheap
    * "same content modulo formatting" identity used before fuzzy dedup.
    */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      md5(concat_ws(" ", tokens(col("text")))).as("fingerprint"))

  /** Rolling polynomial (Karp-Rabin) fingerprint over the token stream —
    * base-31 polynomial of per-token codes modulo 2^31-1, token code =
    * sum of character codepoints (kept engine-portable: both Spark and any
    * SQL oracle can reproduce it with integer arithmetic only).
    * Intermediate values stay < 2^36, far from Long overflow.
    */
  def rollingFingerprint(docs: DataFrame): DataFrame = {
    val Mod = 2147483647L // 2^31 - 1
    val t = tokens(col("text"))
    val tokCode = (w: Column) =>
      aggregate(sequence(lit(1), length(w)), lit(0L),
        (acc, i) => acc + ascii(call_function("substring", w, i, lit(1))).cast("long"))
    val rolling = aggregate(t, lit(0L),
      (acc, w) => (acc * 31L + tokCode(w)) % Mod)
    // per-char interpreted evaluation is CPU-heavy; spread the (often
    // single-file) scan across cores before computing
    docs.repartition(col("doc_id")).select(col("doc_id"), rolling.as("rolling_fp"))
  }

  // ---------------------------------------------------------------- n-grams

  /** Word n-grams of the token stream as an array column; docs shorter than
    * `n` tokens get an empty array.
    *
    * Built from n shifted `slice`s folded with `zip_with` — NOT a
    * `transform(sequence(...), i => slice(toks, i+1, n))`: interpreted
    * higher-order functions re-evaluate lambda-BODY subexpressions per
    * element, so referencing the token array inside the lambda re-runs the
    * whole tokenizer once per n-gram position per row (measured: dominated
    * dedup at sf0.1). Slice/zip_with arguments evaluate exactly once,
    * whatever the optimizer does to surrounding projections.
    */
  def ngrams(toks: Column, n: Int): Column =
    // Native single-pass kernel (r17): the former HOF formulation — n
    // shifted slices zip_with-reduced with concat_ws — evaluated
    // interpreted AND re-evaluated `toks` once per slice, which is why
    // every caller had to materialize tokens behind a repartition barrier.
    // The native expression evaluates its child exactly once per row inside
    // codegen; equivalence with the HOF reference is spec-asserted
    // (TokenizeSpec "ngrams native kernel").
    graft.functions.Tokenize.ngrams(toks, n)

  /** Corpus-level top-K n-grams by document frequency-weighted count.
    * One explode + one partial/final hash aggregate + top-K — the canonical
    * map-side-combine shape; at 100 TB this is a single shuffle keyed on the
    * n-gram with AQE handling skew.
    */
  def topNgrams(docs: DataFrame, n: Int, k: Int): DataFrame =
    docs.select(col("doc_id"), col("text"))
      .repartition(col("doc_id")) // spread the scan; native chain runs post-exchange
      .select(explode(ngrams(tokens(col("text")), n)).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("ngram").asc)
      .limit(k)

  /** PII scrubbing patterns — chosen to mean the same thing in Java regex
    * (Spark codegen) and RE2 (so an external auditor can re-run the scrub in
    * any engine): no backreferences, no lookaround.
    */
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val PhoneRe = "\\d{3}[- ]\\d{4}"

  /** PII redaction over the text column: emails then phone-shaped digit runs
    * replaced with typed placeholders, plus the match count (the audit
    * signal a scrubbing pass reports). A narrow per-row projection — the
    * codegen'd regex kernels run inside whole-stage codegen, nothing
    * shuffles.
    */
  def redactPii(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      (size(regexp_extract_all(col("text"), lit(EmailRe), lit(0))) +
        size(regexp_extract_all(col("text"), lit(PhoneRe), lit(0))))
        .cast("long").as("n_redacted"),
      regexp_replace(regexp_replace(col("text"), EmailRe, "[EMAIL]"),
        PhoneRe, "[PHONE]").as("clean_text"))

  /** Gopher-style repetition signals per document: the fraction of bigram
    * occurrences claimed by the single most frequent bigram, and the
    * fraction that are repeats of an earlier bigram — high values mark
    * boilerplate/spam that length and stopword ratios miss.
    *
    * Plan shape: one explode, then two map-side-combining aggregates keyed
    * (doc_id, bigram) → doc_id — per-key state is tiny and keys are
    * near-uniform, so both shuffles stay balanced at corpus scale. Docs with
    * fewer than two tokens score 0.0 on both signals.
    */
  def repetitionScore(docs: DataFrame): DataFrame = {
    val bg = docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .repartition(col("doc_id"))
      .select(col("doc_id"), explode(ngrams(col("toks"), 2)).as("bg"))
    val agg = bg.groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n"), max("c").as("top"), count(lit(1)).as("nd"))
    docs.select(col("doc_id")).join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        // exact integer round-6 (1 − nd/n ≡ (n−nd)/n as a rational);
        // float round(x, 6) diverges cross-engine on .5e-6 boundaries
        coalesce(roundDiv6(col("top"), col("n")), lit(0.0))
          .as("top_bigram_frac"),
        coalesce(roundDiv6(col("n") - col("nd"), col("n")), lit(0.0))
          .as("dup_bigram_frac"))
  }

  // ----------------------------------------- learned quality classifier

  /** TRAIN a linear text-quality classifier — the GPT-3 curation recipe's
    * missing half (p12 samples BY a score; this LEARNS the score from the
    * corpus): label each document by the exact quality blend
    * (positive ⟺ micros ≥ `posMicros`), count tokens per class, and weight
    * each token by the difference of its Laplace-smoothed class
    * frequencies. Returns the top-`vocabSize` (token, weight_micros) rows
    * by |weight| (ties by token) — a naive-Bayes-shaped LINEAR-probability
    * model (documented deviation from log-space NB: subtraction instead
    * of log-ratio keeps every weight an exact integer, so training and
    * scoring are bit-identical on any engine — no `ln` whose last ulp
    * differs across math libraries).
    *
    * weight_micros(t) = ⌊(10⁶·(pc+1) + ⌊(PT+V)/2⌋) / (PT+V)⌋
    *                  − ⌊(10⁶·(nc+1) + ⌊(NT+V)/2⌋) / (NT+V)⌋
    * (pc/nc = class token counts, PT/NT = class totals, V = distinct
    * vocabulary — all exact longs; the divisions are [[roundDiv6]]'s
    * HALF_UP integer form with the scaled numerator in DECIMAL(38,0),
    * so — unlike the per-doc 2⁵³ double guard — class totals are exact
    * at any realistic corpus size.)
    *
    * At 100 TB: one tokenize/explode pass partial-combining into the
    * (token, pc, nc) table — corpus-rows in, vocabulary-rows out; the
    * 1-row class-totals aggregate broadcasts back over that metadata-scale
    * table (never the corpus), and the top-K is a TakeOrdered merge. The
    * corpus is read ONCE and never collected.
    */
  def trainQualityClassifier(docs: DataFrame, posMicros: Long = 500000L,
                             vocabSize: Int = 256): DataFrame =
    // eager count table (r18): classifierWeights reads its input TWICE (the
    // class-total broadcast and the weight projection), and as broadcast
    // subqueries those reads re-ran the corpus tokenize+count pass once
    // each; the checkpoint (|corpus vocab| rows — metadata-scale) runs it
    // once. Values unchanged; maintenance paths call classifierWeights
    // directly with their own materialized count tables.
    // (a text barrier before the count pass was tried and measured WORSE in
    // full-bench context — the exchange ships full text for a pass the
    // map-side combine already keeps narrow; reverted, §1 discipline)
    classifierWeights(
      classifierCounts(docs, posMicros).localCheckpoint(true), vocabSize)

  /** The classifier's TRAINING STATE: one `(token, pc, nc)` row per
    * corpus token — per-class occurrence counts under the quality label.
    * Additive per document (a doc contributes its token bag to exactly
    * one class), which is what makes the state incrementally maintainable
    * ([[maintainClassifierCounts]]): counts fold, they are never
    * re-derived from history.
    */
  def classifierCounts(docs: DataFrame, posMicros: Long = 500000L): DataFrame =
    docs.select(tokens(col("text")).as("t"))
      .select(col("t"), (qualityMicrosCol(col("t")) >= posMicros).as("pos"))
      .select(explode(col("t")).as("token"), col("pos"))
      .groupBy("token")
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("pc"),
        sum(when(col("pos"), 0L).otherwise(1L)).as("nc"))

  /** The weight table from a count table (the training's second half —
    * pure metadata-scale arithmetic over |vocab| rows).
    */
  def classifierWeights(counts: DataFrame, vocabSize: Int = 256): DataFrame = {
    val totals = counts.agg(sum("pc").as("pt"), sum("nc").as("nt"),
      count(lit(1)).as("v"))
    def smoothedMicros(cnt: Column, tot: Column): Column = {
      val den = tot + col("v")
      val scaled = lit(1000000L).cast("decimal(38,0)") * (cnt + lit(1L)) +
        shiftright(den, 1)
      ((scaled - pmod(scaled, den)) / den).cast("long")
    }
    counts.crossJoin(broadcast(totals))
      .select(col("token"),
        (smoothedMicros(col("pc"), col("pt"))
          - smoothedMicros(col("nc"), col("nt"))).cast("long")
          .as("weight_micros"))
      .orderBy(abs(col("weight_micros")).desc, col("token"))
      .limit(vocabSize)
  }

  /** Gopher-style RULE battery (Rae et al. 2021, Appendix A1.1 — the
    * published MassiveText pre-filter that runs BEFORE any model-based
    * gate; t3/t9 cover the blended and repetition signals, this is the
    * named hard-threshold set). Every rule is an exact integer/rational
    * predicate — ratios compare CROSS-MULTIPLIED (3·n ≤ Σlen, never a
    * divided float) so each verdict is bit-identical on any engine:
    *
    *   - `word_count_ok`: 50 ≤ n_tokens ≤ 100 000
    *   - `word_length_ok`: 3 ≤ mean token length ≤ 10
    *     (Σlen via `length(array_join(t, ""))` — codegen'd, no HOF fold)
    *   - `symbol_ratio_ok`: '#' + '…'-as-'...' occurrences ≤ 0.1·n_tokens
    *   - `alpha_ratio_ok`: ≥ 80 % of tokens contain a letter
    *     (5·n_alpha ≥ 4·n_tokens; the per-token letter test is the one
    *     interpreted HOF here — report-tier cost; a 100 TB deployment
    *     gates with the kernel family first)
    *   - `stopword_ok`: ≥ 2 of the paper's 8 required stopwords present
    *     (membership of the 8-word literal probed against the doc — an
    *     8-element filter, unambiguous duplicate semantics both engines)
    *
    * plus the conjunction `pass`. One narrow map over the scan.
    */
  def gopherRules(docs: DataFrame): DataFrame = {
    val rules = gopherRuleCols(col("text"))
    docs.select(Seq(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tokens")) ++
        rules.map { case (n, c) => c.as(n) }: _*)
      .withColumn("pass", rules.map(r => col(r._1)).reduce(_ && _))
  }

  /** The five rule predicates over a text column (shared by
    * [[gopherRules]] and [[Quality.dataCard]] so the thresholds cannot
    * drift between the per-doc report and the per-source rollup).
    */
  private[operators] def gopherRuleCols(text: Column): Seq[(String, Column)] = {
    val req = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val t = tokens(text)
    val nTok = size(t).cast("long")
    val sumLen = length(array_join(t, "")).cast("long")
    val hashes = length(text) - length(regexp_replace(text, "#", ""))
    val ellipses = (length(text) -
      length(regexp_replace(text, "\\.\\.\\.", ""))) / 3
    val symbols = (hashes + ellipses).cast("long")
    val nAlpha = size(filter(t, w => w.rlike("[a-z]"))).cast("long")
    val nReq = size(filter(typedLit(req), s => array_contains(t, s))).cast("long")
    Seq(
      "word_count_ok" -> (nTok >= 50L && nTok <= 100000L),
      "word_length_ok" -> (sumLen >= lit(3L) * nTok && sumLen <= lit(10L) * nTok),
      "symbol_ratio_ok" -> (lit(10L) * symbols <= nTok),
      "alpha_ratio_ok" -> (lit(5L) * nAlpha >= lit(4L) * nTok),
      "stopword_ok" -> (nReq >= 2L))
  }

  /** Classifier counts from REFERENCE corpora — the exact GPT-3 setup:
    * a curated positive corpus (WebText, in the paper) against the raw
    * negative pool, instead of [[classifierCounts]]'s per-document proxy
    * label. Same count table shape, so [[classifierWeights]],
    * [[maintainClassifierCounts]], scoring, and sampling all compose
    * unchanged. One tokenize/explode pass over each corpus,
    * union-tagged into the same single vocabulary-scale aggregate.
    */
  def referenceCounts(positives: DataFrame, negatives: DataFrame): DataFrame =
    positives.select(explode(tokens(col("text"))).as("token"), lit(true).as("pos"))
      .unionByName(
        negatives.select(explode(tokens(col("text"))).as("token"), lit(false).as("pos")))
      .groupBy("token")
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("pc"),
        sum(when(col("pos"), 0L).otherwise(1L)).as("nc"))

  /** Fold a delta log of [[classifierCounts]] rows into a base count
    * table — the APPEND-ONLY maintenance form (the stream's side of the
    * house: [[graft.streaming.EventStream.streamClassifierDeltaFold]]
    * lands one delta directory per micro-batch). Counts are additive and
    * the sum is order-free, so deltas fold in ANY order and a replayed
    * batch folds idempotently via its directory overwrite (the e15
    * argument, verbatim — this is the same algebra over (pc, nc) instead
    * of (df, n)). Updates/deletes stay on [[maintainClassifierCounts]],
    * which needs pre-images.
    */
  def classifierCountsWithDeltas(base: DataFrame, deltaLog: DataFrame): DataFrame =
    base.unionByName(deltaLog.select("token", "pc", "nc"))
      .groupBy("token")
      .agg(sum("pc").as("pc"), sum("nc").as("nc"))
      .where(col("pc") =!= 0L || col("nc") =!= 0L)

  /** INCREMENTAL classifier maintenance — the change-feed discipline
    * (the q8/s15 family) applied to the training state: fold the counts
    * of `added` documents in and `removed` documents out of an existing
    * [[classifierCounts]] table. An UPDATE is remove(old) + add(new).
    * Exact by algebra: per-class token counts are a sum over documents
    * and each document's label depends only on its own text, so the
    * maintained table equals a from-scratch recount of the effective
    * corpus bit-for-bit (spec-pinned), including the vocabulary itself —
    * a token whose last document leaves nets to (0, 0) and is dropped,
    * so the smoothing denominator V tracks the true vocabulary.
    *
    * At 100 TB: the tokenize/explode cost is |added| + |removed| — the
    * CHANGE WINDOW, never the corpus — and the fold shuffles
    * vocabulary-scale rows only. The corpus is not rescanned; the base
    * count table is the only full-vocabulary input, and it is
    * metadata-scale by construction.
    */
  def maintainClassifierCounts(base: DataFrame, added: DataFrame,
                               removed: DataFrame,
                               posMicros: Long = 500000L): DataFrame = {
    val minus = classifierCounts(removed, posMicros)
      .select(col("token"), (-col("pc")).as("pc"), (-col("nc")).as("nc"))
    base.unionByName(classifierCounts(added, posMicros)).unionByName(minus)
      .groupBy("token")
      .agg(sum("pc").as("pc"), sum("nc").as("nc"))
      .where(col("pc") =!= 0L || col("nc") =!= 0L)
  }

  /** SCORE documents with a trained classifier (the [[trainQualityClassifier]]
    * output): collect the weight table — bounded by vocabSize, the
    * broadcast-stats pattern — into a literal map, and fold each document's
    * tokens through `element_at` lookups into one exact long sum.
    * score_micros is order-free integer arithmetic (identical on any
    * partitioning and any engine); the decision rule `score > 0` is
    * "leans toward the positive class" in the linear-probability model.
    *
    * At 100 TB: a narrow per-row codegen'd map — tokenize, map-lookup
    * fold, compare — NO shuffle, no join, the corpus read once.
    */
  def scoreWithClassifier(docs: DataFrame, weights: DataFrame): DataFrame =
    scoreWithWeightMap(docs, weights.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap)

  /** [[scoreWithClassifier]] over an already-collected weight map — the
    * FROZEN-model form a serving/streaming path uses (train offline,
    * broadcast the map, score every arriving batch with zero training
    * dependency at score time).
    *
    * The fold is the native [[graft.functions.WeightSumExpr]] kernel —
    * hash-table lookups in one codegen'd JVM loop. The declarative twin
    * (`aggregate` + `element_at` on a map literal) is interpreted AND
    * scans the literal linearly per lookup: the century probe measured it
    * 133× wall at 100× rows, where the kernel tracks the scan (see
    * BASELINE round-13 classifier table; semantics parity spec-pinned in
    * TokenizeExprSpec).
    */
  def scoreWithWeightMap(docs: DataFrame, w: Map[String, Long]): DataFrame =
    docs.select(col("doc_id"),
      graft.functions.Tokenize.weightSum(tokens(col("text")), w)
        .as("score_micros"))
      .withColumn("predicted_hq", col("score_micros") > 0L)

  /** VOCABULARY-GROWTH CURVE (Heaps' law audit) — cumulative corpus size
    * vs cumulative distinct-token count at each ingest decile: the
    * scaling diagnostic that tells a data buyer whether the next decile
    * of corpus still buys new vocabulary (sub-linear growth flattening
    * early = the corpus is saturating/duplicated; the curve every
    * tokenizer-budget and dedup-policy decision reads).
    *
    * Everything exact integers. "Ingest order" is doc_id order, and the
    * per-doc rank comes from the DISTRIBUTED bucketed prefix sum (the
    * c9 ECDF machinery: order-preserving range buckets over a broadcast
    * min/max, per-bucket row_number + a metadata-scale offset window) —
    * never a global single-partition sort. A token's first-occurrence
    * decile is the decile of its MIN rank (decile is monotone in rank),
    * one map-side-combining min per token; the cumulative sums run over
    * the `buckets`-row spine.
    */
  def vocabGrowth(docs: DataFrame, buckets: Int = 10,
                  rangeBuckets: Int = 1024): DataFrame = {
    require(buckets > 0 && rangeBuckets > 0, "buckets must be positive")
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(col("doc_id"),
      coalesce(tokens(col("text")), array().cast("array<string>")).as("t"))
    val bounds = base.agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
    val span = (col("hi") - col("lo")).cast("double")
    val bkt = when(span === 0.0, lit(0L)).otherwise(
      least(lit(rangeBuckets - 1L),
        floor((col("doc_id") - col("lo")).cast("double") / span * rangeBuckets)
          .cast("long")))
    val gb = base.crossJoin(broadcast(bounds))
      .select(col("doc_id"), col("t"), bkt.as("bkt"))
    val offW = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = gb.groupBy("bkt").agg(count(lit(1)).as("bn"))
      .select(col("bkt"), coalesce(sum("bn").over(offW), lit(0L)).as("off"))
    val n = base.count()
    val ranked = gb
      .withColumn("rn", row_number().over(
        Window.partitionBy("bkt").orderBy("doc_id")).cast("long"))
      .join(broadcast(offsets), "bkt")
      .select(col("doc_id"), col("t"),
        (expr(s"(rn + off - 1) * $buckets DIV $n") + 1L).as("dec"))
    val perDec = ranked.groupBy("dec")
      .agg(count(lit(1)).as("docs"), sum(size(col("t"))).cast("long").as("toks"))
    val newTypes = ranked
      .select(col("dec"), explode(col("t")).as("tok"))
      .groupBy("tok").agg(min("dec").as("dec"))
      .groupBy("dec").agg(count(lit(1)).as("vnew"))
    val spine = docs.sparkSession.range(1, buckets + 1)
      .select(col("id").as("dec"))
    val cumW = Window.orderBy("dec")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine
      .join(perDec, Seq("dec"), "left")
      .join(newTypes, Seq("dec"), "left")
      .select(col("dec").as("decile"),
        sum(coalesce(col("docs"), lit(0L))).over(cumW).as("docs_cum"),
        sum(coalesce(col("toks"), lit(0L))).over(cumW).as("tokens_cum"),
        sum(coalesce(col("vnew"), lit(0L))).over(cumW).as("vocab_cum"))
      .orderBy("decile")
  }

  /** CODE-vs-prose profile — the pretraining-mix router's cheap first
    * gate ("is this document source code?") before anything expensive
    * (language-specific parsing, a learned classifier) runs: per document,
    * the count of code-symbol characters (`{}();=<>[]`), the count of
    * INDENTED lines (leading space/tab — the structural signature prose
    * almost never has), the symbol density in floor-divided micros, and
    * the flag `is_code` = density > 2% OR ≥30% of lines indented (the
    * cross-multiplied integer compare — no division decides anything).
    *
    * Everything exact integers off ONE codegen'd narrow projection — two
    * regexp counts and a line split, no shuffle, no UDF; the flag
    * thresholds are deliberately coarse (a ROUTER, not a judge — the
    * judge is t20's learned classifier downstream).
    */
  def codeProfile(docs: DataFrame): DataFrame = {
    val nSym = size(regexp_extract_all(col("text"),
      lit("[{}();=<>\\[\\]]"), lit(0))).cast("long")
    val lines = split(col("text"), "\n", -1)
    val nLines = size(lines).cast("long")
    val nIndented = size(filter(lines,
      l => l.rlike("^[ \\t]"))).cast("long")
    docs.select(col("doc_id"), nSym.as("n_sym"),
        nLines.as("n_lines"), nIndented.as("n_indented"),
        length(col("text")).cast("long").as("n_chars"))
      .withColumn("sym_e6",
        when(col("n_chars") > 0, expr("(n_sym * 1000000) DIV n_chars"))
          .otherwise(0L))
      .withColumn("is_code",
        col("sym_e6") > 20000L ||
          col("n_indented") * 10 >= col("n_lines") * 3)
      .select("doc_id", "n_sym", "n_indented", "n_lines", "sym_e6", "is_code")
      .orderBy("doc_id")
  }

  /** ZIPF audit of the corpus frequency distribution — the companion to
    * [[vocabGrowth]]'s Heaps'-law curve: for the top-k tokens, rank ×
    * frequency (Zipf's law predicts it constant at the rank-1 frequency)
    * and its ratio to that constant in floor-divided micros. A corpus
    * whose `zipf_e6` collapses far below 10⁶ at small ranks is
    * boilerplate-dominated (a few tokens hogging mass); one far above is
    * synthetic/uniform — both gates a pretraining mix monitors.
    *
    * Everything exact integers: counts from ONE map-side-combining
    * aggregate over the exploded standard tokens (the only corpus-scale
    * job), the top-k a TakeOrdered merge, rank and ratio computed on the
    * k-row result with the 1-row max broadcast back (no global sort, no
    * single-partition window over anything bigger than k rows).
    */
  def zipfCheck(docs: DataFrame, k: Int = 20): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val vocab = docs.select(explode(tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("freq"))
    // materialize the k-row top EAGERLY: it is read twice below (rank
    // branch + the f1 scalar), and without the cut each reference would
    // re-run the corpus aggregate — the scan must happen ONCE
    val top = vocab.orderBy(col("freq").desc, col("tok")).limit(k)
      .localCheckpoint(true)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("freq").desc, col("tok"))
    top.withColumn("rank", row_number().over(w).cast("long"))
      .crossJoin(broadcast(top.agg(max("freq").as("f1"))))
      .select(col("rank"), col("tok"), col("freq"),
        (col("rank") * col("freq")).as("rank_freq"),
        // DECIMAL-widened: rank·freq·10⁶ overflows a long once the top
        // token's frequency passes ~5×10¹¹ — routine at corpus scale
        expr("CAST(rank AS DECIMAL(38,0)) * freq * 1000000 DIV f1").as("zipf_e6"))
      .orderBy("rank")
  }
}
