package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Composed training-data pipeline over the `documents` table — the
  * filter-and-dedup pass every pre-training corpus build runs, assembled
  * from this package's operators:
  *
  *   1. language gate: stopword-profile language ID == target language
  *   2. quality gate: the length/stopword/diversity blend ≥ threshold
  *   3. fuzzy dedup: only survivors of Jaccard near-dup collapsing remain
  *
  * Plan shape at 100 TB: gates 1+2 fuse into ONE narrow projection+filter
  * on the scan (both are per-row Column expressions over the same token
  * array — whole-stage codegen's subexpression elimination evaluates the
  * native tokenizer once); the dedup leg is the inverted-index blocked
  * pair pipeline (never all-pairs); the final survivor join co-shuffles on
  * doc_id. Nothing touches the driver.
  */
object Pipeline {

  /** (doc_id, predicted_lang, quality) for documents passing all three
    * gates, deterministic doc_id order.
    *
    * ONE materialized token pass (the repartition is its shuffle barrier)
    * feeds every consumer: the gate projection's lang/quality expressions
    * and the dedup leg's shingle pipeline all read the same `toks` column,
    * and ReuseExchange serves the barrier's shuffle to both legs — the
    * corpus text is tokenized exactly once (previously each leg re-ran the
    * tokenizer over the full corpus, the largest cost of the composition).
    */
  def pretrainCorpus(docs: DataFrame, language: String = "en",
                     minQuality: Double = 0.4): DataFrame = {
    val tok = docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .repartition(col("doc_id"))
    val (predicted, _) = TextAnalysis.langCols(col("toks"))
    val gated = tok.select(col("doc_id"), predicted.as("predicted_lang"),
        TextAnalysis.qualityCol(col("toks")).as("quality"))
      .where(col("predicted_lang") === language && col("quality") >= minQuality)
    val survivors = Dedup.fuzzyDedupSurvivors(tok.select("doc_id"),
      Dedup.jaccardPairsFromTokens(tok))
    gated.join(survivors, "doc_id")
      .select(col("doc_id"), col("predicted_lang"), col("quality"))
  }

  /** Deterministic train/val/test assignment by Knuth multiplicative hashing
    * of doc_id — pure 64-bit integer arithmetic, so ANY engine reproduces the
    * split exactly and re-processing the corpus (or processing it shard by
    * shard on 1000 executors) never reassigns a document. No shuffle, no
    * sampling state: a narrow per-row map, the only splitting discipline that
    * survives incremental 100 TB ingest.
    *
    * bucket = ((doc_id · 2654435761) mod 2³²) mod 100; products stay well
    * under Long overflow for sequential ids (exact up to doc_id ≈ 3.4×10⁹).
    * GUARD: if ids ever become full-range 64-bit hashes, the product wraps
    * silently — pre-fold such ids (e.g. `pmod(id, 2³²)`) before calling, or
    * the split is still deterministic but no longer the documented formula.
    */
  def hashSplit(docs: DataFrame, trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    val bucket = pmod(pmod(col("doc_id") * lit(2654435761L), lit(4294967296L)), lit(100L))
    docs.select(col("doc_id"),
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + valPct, "val")
        .otherwise("test").as("split"))
  }

  /** Token-budget curation: keep the top `frac` of documents by quality
    * score (ties broken by doc_id — fully deterministic, no interpolated
    * quantile threshold to float-diverge on). Sizing k counts the RAW input
    * (a parquet-statistics count — no tokenize/score pass; the scored frame
    * is row-for-row with `docs`); selection runs as per-partition top-K +
    * merge (`TakeOrderedAndProject`) — no global sort, no shuffle of the
    * corpus. k is guarded against Int overflow (`limit` takes an Int): past
    * ~2.1 B selected documents this fails loudly instead of sampling a
    * wrapped k — at that scale callers should switch to a rank predicate.
    */
  def qualitySample(docs: DataFrame, frac: Double = 0.25): DataFrame = {
    val k = math.ceil(docs.count() * frac).toLong
    require(k <= Int.MaxValue,
      s"qualitySample: k=$k exceeds Int.MaxValue — use a rank-based filter at this scale")
    TextAnalysis.qualityScore(docs)
      .orderBy(col("quality").desc, col("doc_id")).limit(k.toInt)
      .select(col("doc_id"), col("quality"))
  }

  /** QUALITY-WEIGHTED downsampling: keep each document with probability
    * equal to its quality score — the GPT-3 CommonCrawl curation shape
    * (classifier-score-weighted keep, here over the engine's t3 quality
    * blend): high-quality documents nearly always survive, junk rarely,
    * and the expected kept fraction is the corpus's MEAN quality. Unlike
    * [[qualitySample]]'s hard top-frac cut this keeps a graded tail — the
    * property the published curation recipes want (low-quality text still
    * appears, proportionally).
    *
    * The coin is the [[hashSplit]] Knuth multiplicative hash of
    * (doc_id + seed) bucketed to 1e6, compared to the quality's exact
    * 6-decimal MICROS integer ([[TextAnalysis.qualityMicrosCol]]) —
    * integer vs integer, so every engine and every re-run over any
    * partitioning makes the identical keep/drop decision (p8's float
    * `< kf·1e6` compare is safe only because kf is per-SOURCE; a per-doc
    * float compare would diverge on exact-boundary scores). `seed`
    * re-rolls the coins for a fresh epoch without re-scoring.
    *
    * At 100 TB: a narrow per-row map — tokenize, score, hash, compare —
    * NO shuffle, no sampling state, no global pass; shard-by-shard ingest
    * on 1000 executors keeps or drops each document identically.
    */
  def weightedSample(docs: DataFrame, seed: Long = 0L): DataFrame = {
    val micros = TextAnalysis.qualityMicrosCol(TextAnalysis.tokens(col("text")))
    val coin = pmod(pmod((col("doc_id") + lit(seed)) * lit(2654435761L),
      lit(4294967296L)), lit(1000000L))
    docs.select(col("doc_id"), micros.as("__micros"), coin.as("__coin"))
      .where(col("__coin") < col("__micros"))
      .select(col("doc_id"), (col("__micros").cast("double") / 1e6).as("quality"))
  }

  /** Sequence packing for pre-training: assign every document a fixed
    * token-budget pack id. Packing is SHARD-LOCAL (shard = pmod(doc_id,
    * shards)): each shard packs its documents independently in doc_id order,
    * a pack boundary falling every `budget` tokens of the shard's running
    * token stream (concatenate-and-chunk, the standard pretraining batch
    * discipline — a doc whose start offset crosses a boundary begins the
    * next pack). Shard-locality is what makes it scale: the only shuffle is
    * the hash partition on the shard key and the running sum is a per-shard
    * window — a single global cumulative sum would serialize the corpus
    * through one partition. Deterministic: doc_id order, integer arithmetic.
    */
  def packSequences(docs: DataFrame, budget: Long = 512, shards: Int = 32): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(shards > 0, s"shards must be positive, got $shards")
    val counted = docs.select(col("doc_id"),
      size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"),
      pmod(col("doc_id"), lit(shards.toLong)).as("shard"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    counted
      .withColumn("start_offset", sum("n_tokens").over(w) - col("n_tokens"))
      .withColumn("pack_id", col("shard") * 1000000L + expr(s"start_offset div $budget"))
      .select("doc_id", "shard", "n_tokens", "start_offset", "pack_id")
  }

  /** Sequence packing v2: shard-local FIRST-FIT-DECREASING into fixed-
    * capacity bins — the packer that reduces the padding waste
    * [[paddingEfficiency]] (p20) prices. [[packSequences]] (p5)
    * concatenates-and-chunks: zero padding but documents SPLIT across
    * pack boundaries; FFD keeps every document whole (the contract
    * attention-masked per-document batching needs) and eats the waste
    * bin-packing-optimally-ish instead — FFD uses ≤ 11/9·OPT + 6/9 bins
    * (Dósa's tight bound), in practice a few percent over optimal.
    *
    * Deterministic by construction: docs shard by `pmod(doc_id, shards)`
    * (the p5 rule), each shard sorts its docs by (token length desc,
    * doc_id) and scans once, placing each doc in the FIRST bin it fits,
    * opening a new bin otherwise. Docs longer than `cap` are TRUNCATED to
    * it (p20's long-tail rule — the document is cut, not the batch
    * geometry). Integer arithmetic and a total order end to end, so any
    * engine and any partitioning reproduce the identical assignment —
    * the DuckDB oracle replays the scan as a recursive CTE over ranks.
    *
    * The per-shard scan is GENUINELY SEQUENTIAL (each placement depends
    * on all previous loads), so this is the documented honest
    * `flatMapGroups` shape (the MMR/session-state precedent): state is
    * one (doc_id, n) array per shard plus bin loads — 24 B per doc,
    * shard-bounded. At 100 TB the shard count scales with the corpus
    * (1e5 shards keep shards at ~1e4 docs), the ONLY shuffle is the
    * shard-key exchange, and shards pack embarrassingly parallel.
    *
    * Output: `(doc_id, shard, n_tokens, bin, bin_id)` ordered by doc_id,
    * `bin_id = shard·10⁶ + bin` (p5's pack-id convention).
    */
  def packFirstFitDecreasing(docs: DataFrame, cap: Long = 512,
                             shards: Int = 32): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    require(shards > 0, s"shards must be positive, got $shards")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"),
        least(size(TextAnalysis.tokens(col("text"))).cast("long"), lit(cap)),
        pmod(col("doc_id"), lit(shards.toLong)))
      .as[(Long, Long, Long)]
      .groupByKey(_._3)
      .flatMapGroups { (shard, it) =>
        val ds = it.map(t => (t._1, t._2)).toArray
          .sortBy { case (id, n) => (-n, id) }
        val loads = scala.collection.mutable.ArrayBuffer.empty[Long]
        ds.iterator.map { case (id, n) =>
          var i = 0
          while (i < loads.length && loads(i) + n > cap) i += 1
          if (i == loads.length) loads += n else loads(i) += n
          (id, shard, n, i.toLong)
        }
      }
      .toDF("doc_id", "shard", "n_tokens", "bin")
      .withColumn("bin_id", col("shard") * 1000000L + col("bin"))
      .orderBy("doc_id")
  }

  /** Canonical selection by QUALITY: collapse near-dup clusters keeping
    * the highest-quality member of each (ties by doc_id) — the realistic
    * survivor rule for a pre-training corpus, where a duplicate cluster
    * should contribute its cleanest copy, not its lowest-id one. One row
    * per cluster (singletons included: every unpaired doc survives as its
    * own canonical).
    *
    * Plan shape at 100 TB: cluster labels come from the pointer-jumping CC
    * ([[Dedup.dupClusters]], O(log diameter) rounds); quality is one
    * narrow codegen'd pass; the argmax is a WindowGroupLimit-eligible
    * row_number ≤ 1 over the cluster key — per-partition partial top-1
    * below the shuffle, so no cluster ever materializes fully.
    */
  def bestQualitySurvivors(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val clusters = Dedup.dupClusters(docs.select(col("doc_id")), pairs)
      .select(col("doc_id"), col("cluster_rep"))
    val scored = TextAnalysis.qualityScore(docs)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_rep").orderBy(col("quality").desc, col("doc_id"))
    clusters.join(scored, "doc_id")
      .withColumn("rank", row_number().over(w))
      .where(col("rank") === 1)
      .select(col("doc_id"), col("cluster_rep"), col("quality"))
  }

  /** Per-stratum quota curation ("data mixing"): the top `quota` documents
    * of every detected language by quality score, ties by doc_id. One
    * shuffle on the language key; Spark's WindowGroupLimit pushes the
    * rank ≤ quota cut below the shuffle as a per-partition partial top-k,
    * so no stratum ever materializes fully — the shape that lets a mixing
    * recipe run over a 100 TB corpus with a handful of strata.
    */
  def stratifiedSample(docs: DataFrame, quota: Int = 50): DataFrame = {
    val t: Column = TextAnalysis.tokens(col("text"))
    val (predicted, _) = TextAnalysis.langCols(t)
    val scored = docs.select(col("doc_id"), predicted.as("lang"),
      TextAnalysis.qualityCol(t).as("quality"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("quality").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= quota)
      .select("doc_id", "lang", "quality", "rank")
  }

  /** Eval-set decontamination: for every training document, count the
    * distinct word-n-grams it shares with ANY eval document (the standard
    * benchmark-contamination check run before pre-training).
    *
    * Plan shape at 100 TB: the eval side is tiny relative to the corpus, so
    * its distinct n-gram set is BROADCAST — the training side is one narrow
    * tokenize→n-gram pass plus a map-side-combining count, and the 100 TB
    * scan never shuffles. Tokens materialize behind a shuffle barrier before
    * the per-position n-gram lambda reads them (the CollapseProject /
    * HOF-re-evaluation hazard — see Dedup.withShingles).
    */
  def contamination(train: DataFrame, evalDocs: DataFrame, n: Int = 5): DataFrame = {
    val evalNgrams = grams(evalDocs, n).select("ng").distinct()
    val shared = grams(train, n).join(broadcast(evalNgrams), "ng")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    train.select(col("doc_id")).join(shared, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_shared"), lit(0L)).as("n_shared"))
      .withColumn("contaminated", col("n_shared") > 0)
  }

  /** The REVERSE contamination report — per-EVAL-item dirtiness, the
    * GPT-3 appendix methodology (Brown et al. 2020, "Measuring and
    * Preventing Memorization"-style percent-clean tables): for each eval
    * document, the fraction of ITS n-grams that appear anywhere in the
    * training corpus, plus the `clean` flag (zero overlap). [[contamination]]
    * answers "which TRAIN docs to drop"; this answers "how dirty is each
    * BENCHMARK item" — the number a paper publishes per eval suite.
    *
    * Direction is what makes it scale-sound: the eval n-gram set is
    * metadata-scale and broadcasts INTO the one train scan; the matched
    * set coming back is bounded by the eval set (≤ |eval n-grams| rows,
    * never corpus-sized), and the per-item fraction folds eval-side. The
    * fraction is the exact HALF_UP 6-decimal integer division. Sub-n-token
    * eval items carry no n-gram and report (0, 0, 0.0, clean).
    */
  def evalContaminationReport(train: DataFrame, evalDocs: DataFrame,
                              n: Int = 5): DataFrame = {
    val evalG = grams(evalDocs, n)
    val evalSet = evalG.select("ng").distinct()
    val hit = grams(train, n)
      .join(broadcast(evalSet), Seq("ng"), "left_semi")
      .select("ng").distinct()
    val per = evalG
      .join(broadcast(hit.withColumn("__h", lit(1L))), Seq("ng"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__h"), lit(0L))).as("n_hit"))
    evalDocs.select("doc_id").join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        when(coalesce(col("n_grams"), lit(0L)) > 0,
          TextAnalysis.roundDiv6(coalesce(col("n_hit"), lit(0L)),
            coalesce(col("n_grams"), lit(0L))))
          .otherwise(lit(0.0)).as("dirty_frac"),
        (coalesce(col("n_hit"), lit(0L)) === 0L).as("clean"))
  }

  /** Distinct word-n-grams per doc, tokens materialized behind a shuffle
    * barrier (shared by [[contamination]] and [[contaminationBloom]]).
    */
  private def grams(df: DataFrame, n: Int): DataFrame =
    df.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .repartition(col("doc_id"))
      .select(col("doc_id"),
        explode(array_distinct(TextAnalysis.ngrams(col("toks"), n))).as("ng"))

  /** Sketch twin of [[contamination]]: when the eval n-gram set is too big
    * to broadcast exactly (a full benchmark-suite union against a 100 TB
    * corpus), fold it into a Bloom filter — Spark's own runtime-filter
    * sketch — and probe the training side with a codegen'd membership test.
    * NO false negatives (a truly shared n-gram always hits), so every
    * exactly-contaminated doc is flagged; `n_candidate ≥ n_shared` with a
    * bounded false-positive surplus set by `bitsPerItem` (16 ≈ 4e-4 FPR).
    * Deterministic: Bloom insertion is a bit-OR, order-independent.
    *
    * Plan shape at 100 TB: the eval side folds DISTRIBUTEDLY into one
    * filter (TypedImperativeAggregate with partial merge); only the
    * serialized filter — kilobytes to megabytes by construction — crosses
    * the driver, ships as a plan literal, and the corpus side stays one
    * narrow n-gram pass + probe + map-side-combining count, exactly like
    * the exact path but with O(bits) instead of O(eval-set) memory.
    */
  def contaminationBloom(train: DataFrame, evalDocs: DataFrame, n: Int = 5,
                         expectedItems: Long = 1L << 20,
                         bitsPerItem: Int = 16): DataFrame = {
    val bf = grams(evalDocs, n).select("ng").distinct()
      .agg(graft.functions.Sketches.bloomFilterAgg(
        xxhash64(col("ng")), expectedItems, bitsPerItem.toLong * expectedItems).as("bf"))
      .head().getAs[Array[Byte]](0)
    val candidates =
      if (bf == null) // empty eval set → nothing can be contaminated
        train.select(col("doc_id"), lit(0L).as("n_candidate")).limit(0)
      else grams(train, n)
        .where(graft.functions.Sketches.mightContain(bf, xxhash64(col("ng"))))
        .groupBy("doc_id").agg(count(lit(1)).as("n_candidate"))
    train.select(col("doc_id")).join(candidates, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_candidate"), lit(0L)).as("n_candidate"))
      .withColumn("contaminated", col("n_candidate") > 0)
  }

  /** Domain-mixture curation: downsample each source/domain so its share of
    * the output token budget approaches the target weight in `shares` (a
    * `(source, share)` config table — a mixing recipe à la The Pile /
    * DoReMi). The output budget is `budgetFrac` of the corpus's total
    * tokens; a source's keep-fraction is min(1, budget·share / sourceTokens)
    * — over-represented domains are thinned, under-represented ones kept
    * whole (this operator never upsamples). Selection is the same Knuth
    * multiplicative doc_id hash as [[hashSplit]], bucketed to 1e6: fully
    * deterministic, engine-portable, and stable under re-processing — a
    * document's fate never depends on partitioning or row order. Sources
    * missing from `shares` are dropped (inner join): the recipe IS the
    * allowlist. Output: the surviving `(doc_id, source, n_tok)`.
    *
    * Plan shape at 100 TB: one narrow tokenize-count projection; per-source
    * totals are a map-side-combining aggregate yielding a handful of rows,
    * joined to `shares` and BROADCAST back against the corpus along with
    * the 1-row grand total — the corpus never shuffles, and the keep/drop
    * decision is a codegen'd per-row predicate.
    */
  def domainMix(docs: DataFrame, shares: DataFrame,
                budgetFrac: Double = 0.5): DataFrame = {
    val docTok = docs.select(col("doc_id"), col("source"),
      size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok"))
    val bySrc = docTok.groupBy("source").agg(sum("n_tok").as("src_tok"))
    // corpus total off the |sources|-row aggregate, NOT a second corpus
    // tokenize pass — identical exact sum (every doc has a source)
    val total = bySrc.agg(sum("src_tok").cast("double").as("corpus_tok"))
    val keepFrac = bySrc.join(shares, "source").crossJoin(total)
      .select(col("source"),
        least(lit(1.0), lit(budgetFrac) * col("corpus_tok") * col("share") / col("src_tok"))
          .as("keep_frac"))
    val bucket = pmod(pmod(col("doc_id") * lit(2654435761L), lit(4294967296L)), lit(1000000L))
    docTok.join(broadcast(keepFrac), "source")
      .where(bucket < col("keep_frac") * 1e6)
      .select("doc_id", "source", "n_tok")
  }

  /** CLASSIFIER-score-weighted downsampling — [[weightedSample]]'s
    * keep-probability driven by the LEARNED model instead of the
    * heuristic blend (the actual GPT-3 CommonCrawl recipe shape: docs
    * kept with probability increasing in the quality classifier's
    * score). The score ([[TextAnalysis.scoreWithClassifier]]'s exact
    * long) min-max normalizes to keep-micros ∈ [0, 10⁶] — the corpus
    * minimum is never kept, the maximum always, everything else linear
    * in between — via the same HALF_UP integer division as the quality
    * micros (DECIMAL-scaled, exact at any score range); a degenerate
    * corpus (all scores equal) keeps everything. The coin is the
    * seeded Knuth hash, integer vs integer.
    *
    * At 100 TB: one narrow score pass + a 2-value (min, max) aggregate
    * broadcast back + the per-row coin compare. No shuffle of the
    * corpus; the normalization stat is the only global state and it is
    * 2 longs.
    */
  def classifierWeightedSample(docs: DataFrame, weights: DataFrame,
                               seed: Long = 0L): DataFrame = {
    val scored = TextAnalysis.scoreWithClassifier(docs, weights)
      .select("doc_id", "score_micros")
    val bounds = scored.agg(min("score_micros").as("lo"),
      max("score_micros").as("hi"))
    val den = col("hi") - col("lo")
    val scaled = lit(1000000L).cast("decimal(38,0)") *
      (col("score_micros") - col("lo")) + shiftright(den, 1)
    val keepMicros = when(den === 0L, lit(1000000L))
      .otherwise(((scaled - pmod(scaled, den)) / den).cast("long"))
    val coin = pmod(pmod((col("doc_id") + lit(seed)) * lit(2654435761L),
      lit(4294967296L)), lit(1000000L))
    scored.crossJoin(broadcast(bounds))
      .select(col("doc_id"), col("score_micros"), keepMicros.as("keep_micros"))
      .where(coin < col("keep_micros"))
  }

  /** PERPLEXITY bucketing — the CCNet curation recipe (the third of the
    * published curation trio beside GPT-3's classifier sampling, p14, and
    * XLM-R's temperature mixing, p13): score each document by the corpus
    * bigram-LM cross-entropy ([[TextAnalysis.bigramLm]], the t16
    * statistic) and split the corpus into head / middle / tail at the
    * 33rd and 67th percentile THRESHOLDS — CCNet's own semantics (bucket
    * by value against per-corpus thresholds, not by exact rank, so tied
    * scores land together and the split needs NO global sort).
    *
    * Determinism: the scores are t16's oracle-proven round-4 values; the
    * thresholds are exact interpolated percentiles (the t14
    * rank = q·(n−1) rule both engines implement) rounded to 6; the
    * bucket compare is then double-vs-double of identical values. The
    * two thresholds are a 1-row broadcast — the bucketing pass is a
    * narrow map. At 100 TB the exact percentile buffers each group's
    * values (the t14 trade); the at-scale twin swaps in
    * `approx_percentile` thresholds — same plan shape, sketch-mergeable,
    * with bucket boundaries inside the sketch's rank-error of exact.
    * Sub-2-token documents carry no bigram and are absent, as in t16.
    */
  def perplexityBuckets(docs: DataFrame): DataFrame = {
    val scored = TextAnalysis.bigramLm(docs)
    val bounds = scored.agg(
      round(expr("percentile(xent2, 0.3333333333333333)"), 6).as("b_lo"),
      round(expr("percentile(xent2, 0.6666666666666666)"), 6).as("b_hi"))
    scored.crossJoin(broadcast(bounds))
      .select(col("doc_id"), col("xent2"),
        when(col("xent2") <= col("b_lo"), "head")
          .when(col("xent2") <= col("b_hi"), "middle")
          .otherwise("tail").as("bucket"))
  }

  /** TEMPERATURE-sampled domain mixing — the multilingual-pretraining
    * rebalance rule (XLM-R/mBERT shape): target share_s ∝ p_s^α with
    * α = 0.5, so low-resource sources are up-weighted RELATIVE to their
    * natural share and dominant ones damped, without the hand-written
    * recipe table [[domainMix]] needs. This operator never upsamples
    * (the keep fraction caps at 1); it thins over-represented sources
    * toward the tempered profile under the token budget.
    *
    * α is fixed at 0.5 deliberately: sqrt is the one power IEEE 754
    * guarantees correctly rounded, so every engine computes the SAME
    * tempered weight from the same exact token counts — a general
    * `pow(p, α)` differs in the last ulp across math libraries. The
    * weights are then floor-quantized to integer e-12 units and summed
    * exactly (order-free), so normalization is deterministic too; the
    * only doubles that remain are single divisions/multiplies of
    * identical operands. Selection is the [[hashSplit]] Knuth coin — a
    * document's fate never depends on partitioning or row order.
    *
    * Plan shape at 100 TB: identical to [[domainMix]] — one narrow
    * tokenize-count projection, a map-side-combining per-source
    * aggregate (a handful of rows), the tempered fractions broadcast
    * back, keep/drop a codegen'd per-row predicate; the corpus never
    * shuffles.
    */
  def temperatureMix(docs: DataFrame, budgetFrac: Double = 0.5): DataFrame = {
    val docTok = docs.select(col("doc_id"), col("source"),
      size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok"))
    val bySrc = docTok.groupBy("source").agg(sum("n_tok").as("src_tok"))
    // corpus total off the |sources|-row aggregate, NOT a second corpus
    // tokenize pass — identical exact sum, metadata-scale input
    val total = bySrc.agg(sum("src_tok").cast("double").as("corpus_tok"))
    val weighted = bySrc.crossJoin(broadcast(total))
      .select(col("source"), col("src_tok"), col("corpus_tok"),
        floor(sqrt(col("src_tok").cast("double") / col("corpus_tok")) * lit(1e12))
          .cast("long").as("q"))
    val qTot = weighted.agg(sum("q").cast("double").as("q_tot"))
    val keepFrac = weighted.crossJoin(broadcast(qTot))
      .select(col("source"),
        least(lit(1.0), lit(budgetFrac) * col("corpus_tok") *
          (col("q").cast("double") / col("q_tot")) / col("src_tok"))
          .as("keep_frac"))
    val bucket = pmod(pmod(col("doc_id") * lit(2654435761L), lit(4294967296L)), lit(1000000L))
    docTok.join(broadcast(keepFrac), "source")
      .where(bucket < col("keep_frac") * 1e6)
      .select("doc_id", "source", "n_tok")
  }

  /** Document CHUNKING — the context-window primitive every RAG /
    * long-document training pipeline needs: each document's token stream
    * splits into `chunkSize`-token windows advancing by
    * `chunkSize − overlap`, so consecutive chunks share `overlap` tokens
    * of context. Chunk starts are 0, stride, 2·stride, … while the start
    * still exposes at least one token beyond the previous chunk's overlap
    * (`start < n − overlap`; a short document yields exactly one chunk,
    * an empty one yields none). Output one row per chunk:
    * `(doc_id, chunk_id, n_tokens, chunk_hash)` — the hash (md5 of the
    * space-joined window) stands in for the text so gates and manifests
    * stay metadata-width; callers wanting the text slice it from their
    * own token column with the same arithmetic.
    *
    * At 100 TB: tokenize → explode → slice is one narrow codegen'd pass
    * with NO shuffle at all — chunking parallelizes per input split, and
    * the explode factor is ⌈n/stride⌉, the same blow-up any trainer's
    * loader pays. Deterministic: chunk boundaries are pure integer
    * arithmetic on the token index.
    */
  def chunkDocs(docs: DataFrame, chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive: $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize): $overlap")
    val stride = chunkSize - overlap
    val n = size(col("t"))
    val maxI = floor((greatest(n - overlap - 1, lit(0))).cast("double") / stride)
      .cast("long")
    docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("t"))
      .where(size(col("t")) > 0)
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(0L), maxI)).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        least(lit(chunkSize), n - col("chunk_id") * stride).cast("long").as("n_tokens"),
        md5(array_join(slice(col("t"),
          (col("chunk_id") * stride + 1).cast("int"), lit(chunkSize)), " ")).as("chunk_hash"))
  }

  /** Corpus snapshot DIFF — the version-to-version audit every managed
    * corpus needs before a retrain: classify each document id across two
    * snapshots as `added` (id only in the new snapshot), `removed` (only
    * in the old), `changed` (both, content differs) or `unchanged`, and
    * report per-class document and character totals. Content identity is
    * md5 over a LENGTH-PREFIXED encoding of `contentCols` — each column
    * contributes `len ':' value` with null as `-1:`, so neither column
    * boundaries (("ab","c") vs ("a","bc")) nor a null/empty/sentinel swap
    * can alias — computed scan-side: the diff join carries
    * (id, 16-byte hash, length) rows, NEVER the document text, so at
    * 100 TB the full-outer join shuffles metadata-scale rows co-partitioned
    * on the id and the output is four rows. Per-class totals are exact;
    * `n_chars` counts the NEW side for added/changed/unchanged and the OLD
    * side for removed (the bytes a consumer of the diff would fetch).
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, idCol: String,
                   contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "snapshotDiff needs at least one content column")
    def keyed(df: DataFrame) = df.select(
      col(idCol).as("id"),
      md5(concat(contentCols.map { c =>
        val s = col(c).cast("string")
        concat(coalesce(length(s), lit(-1)).cast("string"), lit(":"),
          coalesce(s, lit("")))
      }: _*)).as("h"),
      contentCols.map(c => coalesce(length(col(c).cast("string")), lit(0)))
        .reduce(_ + _).cast("long").as("len"))
    val o = keyed(oldSnap).withColumnsRenamed(Map("h" -> "h_old", "len" -> "len_old"))
    val n = keyed(newSnap).withColumnsRenamed(Map("h" -> "h_new", "len" -> "len_new"))
    o.join(n, Seq("id"), "full_outer")
      .select(
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_old") =!= col("h_new"), "changed")
          .otherwise("unchanged").as("change"),
        coalesce(col("len_new"), col("len_old")).as("chars"))
      .groupBy("change")
      .agg(count(lit(1)).as("n_docs"), sum("chars").as("n_chars"))
  }

  /** Deterministic sharded corpus export — the DELIVERY step of the
    * pipeline: the curated corpus written as `shards` shard directories
    * whose assignment and content order are pure functions of doc_id, so
    * (a) two exports of the same corpus are content-identical shard for
    * shard (reproducible training runs — spec-pinned byte-for-byte on the
    * data files), and (b) any engine can recompute which shard holds a
    * document without reading the export.
    *
    * shard = Knuth-multiplicative-hash(doc_id) mod `shards` — the
    * [[hashSplit]] discipline (engine-portable integer arithmetic, no
    * dependence on Spark's partitioner), so the export composes with the
    * split/mix operators upstream. One hash `repartition` on the shard key
    * makes shard ↔ task exact: every `shard=k/` directory holds exactly ONE
    * data file (spec-pinned), rows sorted by doc_id inside it — the
    * trainer's data-parallel workers each stream one balanced file.
    * A `_manifest/` side-table (underscore: invisible to a plain read of
    * the export, the `_spark_metadata` convention) records per-shard
    * docs/chars/id-range for fleet-side sanity checks before a run.
    *
    * At 100 TB: ONE shuffle of the corpus (the hash repartition; the
    * within-shard sort is task-local and spills), and the caller sizes
    * `shards` to the trainer's degree. Hash balance keeps shard skew within
    * a few percent on organic ids (spec-measured).
    */
  /** Seeded DETERMINISTIC corpus shuffle — the epoch-ordering step between
    * curation and delivery: trainers want a different document order every
    * epoch AND bit-reproducible runs, so the "shuffle" must be a pure
    * function of (doc_id, seed), never `rand()` or a partitioner accident.
    * Returns `(doc_id, shard, pos)`: the document's shard for this epoch
    * and its position within that shard's stream.
    *
    * The permutation is the [[hashSplit]]/[[shardExport]] hash discipline
    * with the seed mixed in BEFORE the Knuth multiply —
    * `h = ((doc_id + seed·1000003) · 2654435761) mod 2³²` — engine-
    * portable integer arithmetic (the seed offset keeps the product far
    * inside signed-64 range for epoch-scale seeds, so an oracle engine
    * that overflows loudly can replay it), so any engine can recompute
    * any document's epoch placement without reading the export. Shard =
    * h mod `shards`; order within shard = (h, doc_id) — the id tiebreak
    * makes equal-hash collisions deterministic too.
    *
    * At 100 TB: assignment is a narrow map; the within-shard position is
    * a row_number over the shard partition — one hash shuffle on the
    * shard key (the same exchange the delivery write needs anyway, so
    * epoch ordering is FREE when composed with [[epochShuffledExport]]).
    * Per-shard state is the shard's row stream, balanced by the hash.
    */
  def epochOrder(docs: DataFrame, shards: Int, seed: Long): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    val h = pmod((col("doc_id") + lit(seed) * lit(1000003L)) * lit(2654435761L),
      lit(4294967296L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__h"), col("doc_id"))
    docs.withColumn("__h", h)
      .withColumn("shard", pmod(col("__h"), lit(shards.toLong)))
      .withColumn("pos", row_number().over(w))
      .drop("__h")
  }

  /** [[shardExport]] with [[epochOrder]]'s seeded permutation as the
    * delivery order: same one-shuffle write (the epoch columns ride the
    * same exchange the partitioned write needs), shard directories and
    * within-shard row order now a pure function of (doc_id, seed) — a
    * re-export at the same seed is byte-identical (the shardExport
    * reproducibility contract), a different seed is a different epoch.
    */
  def epochShuffledExport(docs: DataFrame, outDir: String, shards: Int,
                          seed: Long): Unit =
    epochOrder(docs, shards, seed)
      .repartition(shards, col("shard"))
      .sortWithinPartitions("shard", "pos")
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)

  def shardExport(docs: DataFrame, outDir: String, shards: Int): Unit = {
    require(shards > 0, s"shards must be positive, got $shards")
    val assigned = docs.withColumn("shard",
      pmod(pmod(col("doc_id") * lit(2654435761L), lit(4294967296L)), lit(shards.toLong)))
    assigned
      .repartition(shards, col("shard"))
      // (shard, doc_id), not doc_id alone: the file writer's required
      // ordering is the partition column, and its re-sort is not stable —
      // a sort the writer can SEE is already satisfied is the only
      // deterministic order. With it, rows land in doc_id order and two
      // exports are byte-identical (spec-pinned).
      .sortWithinPartitions("shard", "doc_id")
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    assigned.groupBy("shard").agg(
        count(lit(1)).as("n_docs"),
        sum(length(col("text"))).cast("long").as("n_chars"),
        min("doc_id").as("min_doc_id"), max("doc_id").as("max_doc_id"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$outDir/_manifest")
  }

  /** Takedown on a DELIVERED training corpus ([[shardExport]] layout):
    * physically remove the given doc_ids from the sharded export and keep
    * the `_manifest` consistent — the compliance op a training-data
    * pipeline owes its sources after delivery. Shard assignment is a pure
    * function of doc_id, so the TOUCHED shard set is computed from the
    * doomed ids alone (the s21/s23 discipline): survivors of those shards
    * rewrite under the export's own determinism contract (same
    * shard+doc_id sort → a rewritten shard is byte-identical to a fresh
    * export of the filtered corpus, spec-pinned), cold shards keep their
    * files untouched. A shard that empties out is swept (dynamic
    * overwrite leaves absent-partition dirs behind) and drops out of the
    * manifest; manifest rows of untouched shards are carried, not
    * recomputed. Re-running the same purge is a no-op. Returns the number
    * of removed documents.
    *
    * At 100 TB: |touched shards| ≤ |doomed ids|, so a takedown batch
    * costs a bounded slice of the export, never a full rewrite — and the
    * doomed-id set rides broadcast semi/anti joins, never a collected
    * filter over the corpus.
    */
  def purgeShardExport(spark: SparkSession, outDir: String,
                       docIds: Seq[Long], shards: Int): Long = {
    require(shards > 0, s"shards must be positive, got $shards")
    if (docIds.isEmpty) return 0L
    import spark.implicits._
    val doomed = broadcast(docIds.toDF("doc_id"))
    // touched shards via the SAME Spark expression the export used —
    // driver-side reimplementation could drift on overflow semantics
    val touched = doomed.select(
        pmod(pmod(col("doc_id") * lit(2654435761L), lit(4294967296L)),
          lit(shards.toLong)).as("shard"))
      .distinct().as[Long].collect().toSeq
    val slice = spark.read.parquet(outDir)
      .where(col("shard").isin(touched.map(Long.box): _*)) // static partition pruning
    val removed = slice.join(doomed, Seq("doc_id"), "left_semi").count()
    if (removed == 0L) 0L // already purged: no-op
    else {
      rewriteTouchedShards(spark, outDir, touched,
        slice.join(doomed, Seq("doc_id"), "left_anti"))
      removed
    }
  }

  /** Mass revocation on a DELIVERED export: purge every document matching
    * a PREDICATE — the "this source withdrew consent" shape, where the
    * doomed set is too large to enumerate driver-side. One column-pruned
    * discovery pass over the export finds the touched shards (a
    * predicate, unlike an id list, says nothing about placement — this
    * scan is the honest price of revocation-by-description, and it reads
    * only the predicate's columns plus `shard`); the rewrite then costs
    * the touched slice exactly like [[purgeShardExport]]. NULL-SAFE the
    * takedown way: a row where the predicate evaluates to null does NOT
    * match and SURVIVES — erasure is only for rows that provably match
    * (the e13 lesson with the opposite default, deliberately).
    */
  def purgeShardExportWhere(spark: SparkSession, outDir: String,
                            condition: Column, shards: Int): Long = {
    require(shards > 0, s"shards must be positive, got $shards")
    import spark.implicits._
    val matches = coalesce(condition, lit(false))
    val touched = spark.read.parquet(outDir).where(matches)
      .select(col("shard").cast("long")).distinct().as[Long].collect().toSeq
    if (touched.isEmpty) 0L // nothing matches anywhere: no-op
    else {
      val slice = spark.read.parquet(outDir)
        .where(col("shard").isin(touched.map(Long.box): _*))
      val removed = slice.where(matches).count()
      rewriteTouchedShards(spark, outDir, touched, slice.where(!matches))
      removed
    }
  }

  /** Shared rewrite tail of the export takedowns: land the survivors of
    * the touched shards via dynamic partition overwrite (the export's own
    * shard+doc_id sort keeps the purge path byte-deterministic), sweep
    * shards that emptied out (unchanged file listing after the write =
    * nothing landed), and rebuild `_manifest` — untouched rows carried,
    * touched rows recomputed from the rewritten data, an emptied shard
    * yields no row.
    */
  private def rewriteTouchedShards(spark: SparkSession, outDir: String,
                                   touched: Seq[Long], survivors: DataFrame): Unit = {
    def listing(sh: Long): Seq[String] = {
      val p = java.nio.file.Paths.get(outDir, s"shard=$sh")
      if (!java.nio.file.Files.isDirectory(p)) Seq.empty
      else graft.util.FsUtil.listDir(p)(_.map(_.getFileName.toString)
        .filter(_.endsWith(".parquet")).toSeq.sorted)
    }
    val before = touched.map(sh => sh -> listing(sh)).toMap
    survivors
      .repartition(math.max(touched.size, 1), col("shard"))
      .sortWithinPartitions("shard", "doc_id") // the export's determinism contract
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("shard").parquet(outDir)
    // emptied shards: unchanged listing after the write = nothing landed
    touched.filter(sh => before(sh).nonEmpty && listing(sh) == before(sh))
      .foreach { sh =>
        graft.util.FsUtil.deleteRecursively(
          java.nio.file.Paths.get(outDir, s"shard=$sh"))
      }
    spark.catalog.refreshByPath(outDir)
    // manifest: carry untouched rows, recompute touched from the rewritten
    // data (an emptied shard simply yields no row). Materialized BEFORE the
    // overwrite of _manifest — the keep branch reads the file being replaced.
    val manifest = spark.read.parquet(s"$outDir/_manifest")
      .where(!col("shard").isin(touched.map(Long.box): _*))
      .unionByName(spark.read.parquet(outDir)
        .where(col("shard").isin(touched.map(Long.box): _*))
        .groupBy("shard").agg(
          count(lit(1)).as("n_docs"),
          sum(length(col("text"))).cast("long").as("n_chars"),
          min("doc_id").as("min_doc_id"), max("doc_id").as("max_doc_id"))
        .select(col("shard").cast("long"), col("n_docs"), col("n_chars"),
          col("min_doc_id"), col("max_doc_id")))
      .localCheckpoint()
    manifest.coalesce(1).write.mode("overwrite").parquet(s"$outDir/_manifest")
  }

  // ------------------------------------------------- DSIR data selection

  /** Shared DSIR scoring core: per-doc importance log-weight from
    * per-doc feature counts (`rawFeat`: doc_id, feat, c) against a
    * bounded feature space (`space`: feat, tc = target count; every
    * feature of the space occurs in the target, hence also in raw).
    * Laplace-smoothed unigram feature models on BOTH sides over the
    * same `spaceSize`-feature support:
    *
    *   logw(doc) = Σ_f c_df · ( ln p_t(f) − ln p_r(f) )
    *   p(f) = (count(f) + 1) / (total + spaceSize)
    *
    * Features outside the space contribute nothing (likelihood ratio 1
    * under both models — the paper's hashed form has no outside, the
    * explicit-vocabulary form treats OOV as neutral).
    *
    * Plan: the space and its log-ratio table are metadata-scale by
    * construction (≤ spaceSize rows) and ride a broadcast join; the
    * per-doc fold is one partial-aggregable groupBy on doc_id over the
    * joined counts; the two totals are 1-row aggregates broadcast via
    * crossJoin (the classifierWeightedSample stats pattern). Nothing
    * shuffles the corpus beyond its (doc_id, feat) count pass.
    */
  private def dsirScoreByFeature(allDocs: DataFrame, rawFeat: DataFrame,
                                 space: DataFrame, spaceSize: Int): DataFrame =
    dsirScoreWith(allDocs, rawFeat,
      dsirLogRatio(space, dsirRawCounts(rawFeat, space), spaceSize))

  /** Raw-model counts over the feature space: (feat, rc). Sum-mergeable —
    * per-batch counts fold to the corpus counts in any order, which is
    * what the streaming maintenance rides
    * ([[graft.streaming.EventStream.streamDsirRawFold]]).
    */
  private[graft] def dsirRawCounts(rawFeat: DataFrame, space: DataFrame): DataFrame =
    rawFeat
      .join(broadcast(space.select("feat")), Seq("feat"), "left_semi")
      .groupBy("feat").agg(sum("c").as("rc"))

  /** The broadcast-sized per-feature log-ratio table from the two models. */
  private[graft] def dsirLogRatio(space: DataFrame, rawCnt: DataFrame,
                                  spaceSize: Int): DataFrame =
    space.join(rawCnt, Seq("feat"))
      .crossJoin(broadcast(space.agg(sum("tc").cast("double").as("tt"))))
      .crossJoin(broadcast(rawCnt.agg(sum("rc").cast("double").as("rt"))))
      .select(col("feat"),
        (log((col("tc") + 1) / (col("tt") + spaceSize)) -
          log((col("rc") + 1) / (col("rt") + spaceSize))).as("lw"))

  /** Per-doc fold of feature counts against a log-ratio table. */
  private[graft] def dsirScoreWith(allDocs: DataFrame, rawFeat: DataFrame,
                                   lr: DataFrame): DataFrame = {
    val scores = rawFeat.join(broadcast(lr), Seq("feat"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_feat"), sum(col("c") * col("lw")).as("w"))
    allDocs.select("doc_id").join(scores, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_feat"), lit(0L)).as("n_feat"),
        round(coalesce(col("w"), lit(0.0)), 4).as("logw"))
  }

  /** DSIR importance weights — Data Selection via Importance Resampling
    * (Xie et al. 2023, public): score every raw document by how much
    * more likely its token features are under the TARGET corpus's
    * unigram feature model than under the RAW corpus's, so a top-weight
    * (or Gumbel-resampled) slice of raw shifts the mixture toward the
    * target domain without a trained classifier.
    *
    * This is the explicit-vocabulary form: the feature space is the
    * target's `vocabSize` most frequent tokens (count desc, token asc
    * ties — deterministic), which keeps the space bounded AND the score
    * oracle-checkable/interpretable. [[dsirWeightsHashed]] is the
    * paper's hashed form for when no vocabulary pass is wanted. Returns
    * (doc_id, n_feat, logw round-4) for EVERY raw doc — zero-feature
    * docs score 0 (neutral), they are not dropped.
    *
    * At 100 TB: one tokenize pass over raw feeding a (doc_id, tok)
    * count aggregate; the target is typically a metadata-scale slice or
    * reference corpus; everything downstream of the two count tables is
    * broadcast-sized (see [[dsirScoreByFeature]]).
    */
  /** Per-doc (feat, c) token counts — the corpus's one tokenize pass. */
  private[graft] def docTokenCounts(df: DataFrame): DataFrame =
    df.select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("feat"))
      .groupBy("doc_id", "feat").agg(count(lit(1)).as("c"))

  /** The target's `vocabSize`-token feature space with its counts:
    * (feat, tc), count desc / token asc ties — deterministic.
    */
  def dsirVocab(target: DataFrame, vocabSize: Int): DataFrame =
    target.select(explode(TextAnalysis.tokens(col("text"))).as("feat"))
      .groupBy("feat").agg(count(lit(1)).as("tc"))
      .orderBy(col("tc").desc, col("feat").asc).limit(vocabSize)

  def dsirWeights(raw: DataFrame, target: DataFrame,
                  vocabSize: Int = 256): DataFrame =
    dsirScoreByFeature(raw, docTokenCounts(raw),
      dsirVocab(target, vocabSize), vocabSize)

  /** The paper's HASHED feature space: tokens bucket by
    * `pmod(xxhash64(tok), buckets)` instead of by vocabulary membership,
    * so no vocabulary-learning pass exists and the space is bounded by
    * construction (collisions are the accepted trade, as published).
    * Same scoring core; the space is every bucket the target populates.
    * Not DuckDB-expressible (xxhash64), so it is spec-pinned against
    * planted corpora rather than oracle-checked; [[dsirWeights]] is the
    * oracle-carried twin.
    */
  def dsirWeightsHashed(raw: DataFrame, target: DataFrame,
                        buckets: Int = 4096): DataFrame = {
    def docBucket(df: DataFrame) = df
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), pmod(xxhash64(col("tok")), lit(buckets.toLong)).as("feat"))
    val rawTc = docBucket(raw).groupBy("doc_id", "feat").agg(count(lit(1)).as("c"))
    val space = docBucket(target).groupBy("feat").agg(count(lit(1)).as("tc"))
    dsirScoreByFeature(raw, rawTc, space, buckets)
  }

  /** Deterministic top-`n` DSIR selection: rank by (round-4 logw desc,
    * doc_id asc). The global cut is TakeOrderedAndProject (no full
    * sort); the rank column is a window over the already-cut n rows —
    * metadata-scale by definition of a selection budget.
    */
  def dsirTopK(raw: DataFrame, target: DataFrame, n: Int,
               vocabSize: Int = 256): DataFrame =
    dsirTopKFromWeights(dsirWeights(raw, target, vocabSize), n)

  /** The selection cut over an already-scored weight table — shared by
    * the batch path and the stream-maintained-model path (e24).
    */
  def dsirTopKFromWeights(weights: DataFrame, n: Int): DataFrame = {
    val top = weights.orderBy(col("logw").desc, col("doc_id").asc).limit(n)
    top.withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("logw").desc, col("doc_id").asc)).cast("long"))
      .select("rank", "doc_id", "n_feat", "logw")
  }

  /** SELECTION-AGREEMENT audit between the two published data-selection
    * methods this pipeline ships — DSIR importance weighting (p19, Xie et
    * al. 2023) and GPT-3-style classifier scoring (p14): would they ship
    * the same corpus? Scores both selectors over ONE corpus, ranks each
    * under its own (score desc, doc_id) TOTAL order (ties by id, never
    * averaged — the q14 integer-selection discipline: averaged ties
    * would force float midranks and an engine could swap two near-equal
    * docs), and reports
    *
    *   - Spearman rank correlation over the two permutations in exact
    *     floor-div micros: ρ_e6 = 10⁶ − (6·Σd²·10⁶) div (n·(n²−1)) —
    *     with tie-broken permutation ranks the classic closed form is
    *     EXACT, every term an integer (Σd² DECIMAL(38,0)-widened: it
    *     reaches n³, past a long at corpus scale; the exact path caps at
    *     n ≲ 10¹⁰ docs where 6·Σd²·10⁶ meets DECIMAL(38) — beyond that
    *     the honest twin is a sampled-rank estimate, same shape);
    *   - top-k overlap count — how many docs BOTH selectors would ship;
    *   - the disagreement slice: every doc exactly one selector puts in
    *     its top-k, with both ranks and both raw scores — the rows a
    *     pipeline owner actually reads when the two methods diverge.
    *
    * Ranks come from the c9/t26 DISTRIBUTED bucketed prefix sum
    * ([[Relational.bucketedRank]]) — never a global single-partition
    * Window.orderBy over the corpus. The ranked table persists across
    * its two readers (1-row summary aggregate + ≤2k-row slice); the
    * summary broadcasts back onto the slice, so the output is
    * metadata-scale. Output: `(doc_id, side, dsir_rank, clf_rank, logw,
    * score_micros, rho_e6, overlap_n)` ordered by (side, doc_id).
    */
  def selectionAgreement(docs: DataFrame, target: DataFrame, k: Int,
                         vocabSize: Int = 256,
                         rangeBuckets: Int = 1024): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // The corpus (doc_id, feat, c) count table is materialized ONCE and
    // read by its consumers from storage (r18): DSIR reads it twice (the
    // raw-model counts broadcast and the per-doc score fold), and the
    // classifier's scoring leg derives score_micros from it as
    // Σ c·weight(feat) — long-exact and occurrence-for-occurrence equal to
    // the weightSum kernel over re-tokenized text (spec-pinned) — instead
    // of re-tokenizing the corpus a third time. The former shape tokenized
    // the corpus once per leg (the p24 profile's four ~0.3-1.0 s corpus
    // jobs). A full-corpus Spread barrier was tried first and measured
    // WORSE (7.7 s vs 6.2: every broadcast subquery re-read the exchange
    // and re-tokenized) and reverted — §1 discipline.
    // EAGER materialization (localCheckpoint(true)), not a lazy persist: the
    // consumers launch as ~10 CONCURRENT broadcast-subquery jobs, and a lazy
    // cache races — every concurrent reader recomputes the unbuilt
    // partitions independently (measured: 10 simultaneous copies of the
    // tokenize+count stage, 16.9 s). The eager cut runs the corpus pass
    // once; everything downstream reads the materialized rows.
    // (a text barrier inside this checkpointed subtree was ALSO tried — it
    // parallelized the tokenize but measured +1.3 s in full-bench context:
    // the exchange ships the full text and adds a stage per eager
    // checkpoint; reverted, §1 discipline)
    val rawTc = docTokenCounts(docs).localCheckpoint(true)
    // the target's feature space, eager for the same reason — it feeds the
    // log-ratio join AND the target-total broadcast, each of which would
    // otherwise re-run the target tokenize pass
    val space = dsirVocab(target, vocabSize).localCheckpoint(true)
    val lr = dsirLogRatio(space, dsirRawCounts(rawTc, space), vocabSize)
    val weights = TextAnalysis.trainQualityClassifier(docs, vocabSize = vocabSize)
      .withColumnRenamed("token", "feat")
    // BOTH selectors fold in ONE pass over the count table: a combined
    // per-feature reference (lw for DSIR, weight_micros for the classifier;
    // both metadata-scale) broadcasts, and one doc_id aggregate computes the
    // two scores. Exactness: the DSIR float sum sees the identical c·lw
    // terms in the identical row order (extra vocab-only rows contribute the
    // exact additive identity c·0.0 = +0.0), and the classifier sum is long
    // arithmetic, order-free and occurrence-for-occurrence equal to the
    // weightSum kernel (Σ over occurrences ≡ Σ c·w over per-doc counts).
    val ref = lr.join(weights, Seq("feat"), "full_outer")
    val folded = rawTc.join(broadcast(ref), Seq("feat"))
      .groupBy("doc_id")
      .agg(sum(col("c") * coalesce(col("lw"), lit(0.0))).as("w"),
        sum(col("c") * coalesce(col("weight_micros"), lit(0L))).as("s"))
    val scoredAll = docs.select("doc_id").join(folded, Seq("doc_id"), "left")
      .select(col("doc_id"),
        round(coalesce(col("w"), lit(0.0)), 4).as("logw"),
        coalesce(col("s"), lit(0L)).as("score_micros"))
    val ranked = Relational.bucketedRank(
        Relational.bucketedRank(scoredAll,
            "logw", "doc_id", ascending = false, rangeBuckets)
          .withColumnRenamed("rank", "dsir_rank"),
        "score_micros", "doc_id", ascending = false, rangeBuckets)
      .withColumnRenamed("rank", "clf_rank")
    ranked.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ONE summary action materializes the persisted ranks and carries n,
    // Σd², and the top-k overlap together; ρ is then EXACT driver-side
    // BigInt arithmetic (the same 6·Σd²·10⁶ div (n³−n) floor division —
    // operands non-negative, so trunc ≡ floor ≡ the SQL DIV) injected as
    // literals — the former shape paid a separate count() job plus a
    // summary-broadcast build job for the same three numbers.
    val d = col("dsir_rank") - col("clf_rank")
    val sumRow = ranked.agg(
        sum((d * d).cast("decimal(38,0)")).as("sd2"),
        sum(when(col("dsir_rank") <= k && col("clf_rank") <= k, 1L)
          .otherwise(0L)).as("overlap_n"),
        count(lit(1)).as("n"))
      .collect()(0)
    val n = sumRow.getLong(2)
    require(n >= 2, s"selectionAgreement needs >= 2 documents, got $n")
    val sd2 = BigInt(sumRow.getDecimal(0).toBigInteger)
    val overlapN = sumRow.getLong(1)
    val rhoE6 = 1000000L - (BigInt(6) * sd2 * 1000000 /
      (BigInt(n) * n * n - n)).toLong
    val out = ranked
      .where((col("dsir_rank") <= k) =!= (col("clf_rank") <= k))
      .withColumn("side",
        when(col("dsir_rank") <= k, "dsir_only").otherwise("clf_only"))
      .select(col("doc_id"), col("side"), col("dsir_rank"), col("clf_rank"),
        col("logw"), col("score_micros"),
        lit(rhoE6).as("rho_e6"), lit(overlapN).as("overlap_n"))
      .orderBy("side", "doc_id")
      .localCheckpoint(true)
    ranked.unpersist()
    // release the eager checkpoints' block-manager storage (dead once `out`
    // is materialized — the Bpe.unpersistCheckpoint discipline)
    Seq(rawTc, space).foreach(_.queryExecution.analyzed match {
      case lrdd: org.apache.spark.sql.execution.LogicalRDD => lrdd.rdd.unpersist(false)
      case _ => ()
    })
    out
  }

  /** DSIR's actual sampling rule: n draws WITHOUT replacement with
    * probability ∝ exp(logw), via the Gumbel-top-k equivalence — key =
    * logw + G_i with G_i = −ln(−ln(u_i)) and u_i a seeded per-doc hash
    * uniform (task-retry-reproducible, no RNG state; the epoch-shuffle
    * coin discipline). Still one TakeOrderedAndProject cut.
    */
  def dsirResample(raw: DataFrame, target: DataFrame, n: Int, seed: Long,
                   vocabSize: Int = 256): DataFrame = {
    val u = (pmod(xxhash64(col("doc_id"), lit(seed)), lit(1000000L))
      .cast("double") + 0.5) / 1000000.0
    val key = col("logw") - log(-log(u))
    dsirWeights(raw, target, vocabSize)
      .withColumn("gumbel_key", key)
      .orderBy(col("gumbel_key").desc, col("doc_id").asc).limit(n)
      .select("doc_id", "n_feat", "logw", "gumbel_key")
  }

  /** Mixture EPOCH plan — the data-constrained-scaling arithmetic run
    * before any training mix ships: given target mixture weights (micros,
    * must sum to 10⁶) and a total token budget, how many tokens each
    * source must contribute and how many EPOCHS of its available text
    * that means. Sources whose plan exceeds `capE6` epochs (default 4 —
    * past which repeated data's value decays sharply, the published
    * data-constrained-scaling rule of thumb) are flagged: the mix as
    * specified cannot be met without over-repeating that source.
    *
    * All exact integers: available tokens from ONE map-side-combining
    * aggregate (the only corpus-scale job), planned tokens and epochs by
    * floor division, the flag a long compare. Weights enter as literals
    * (a mixture spec is configuration, not data). NO side is silently
    * dropped: sources in the corpus but not in the spec report weight 0 /
    * planned 0, and a spec'd source with NO corpus rows surfaces with
    * avail 0, null epochs, and over_cap TRUE when it was assigned tokens
    * — the one case the planner most needs to scream about. Output:
    * `(source, avail_tokens, weight_e6, planned_tokens, epochs_e6,
    * over_cap)` ordered by source.
    */
  def mixtureEpochPlan(docs: DataFrame, weights: Map[String, Long],
                       budgetTokens: Long, capE6: Long = 4000000L): DataFrame = {
    require(weights.nonEmpty && weights.values.sum == 1000000L,
      s"weights must sum to exactly 1e6 micros, got ${weights.values.sum}")
    require(budgetTokens > 0 && capE6 > 0, "budget and cap must be positive")
    val toks = size(regexp_extract_all(col("text"),
      lit(s"[^${TextAnalysis.WsClass}]+"), lit(0))).cast("long")
    val wCol = weights.foldLeft(lit(0L)) { case (acc, (k, v)) =>
      when(col("source") === k, lit(v)).otherwise(acc)
    }
    val spec = docs.sparkSession
      .createDataFrame(weights.keys.toSeq.sorted.map(Tuple1(_)))
      .toDF("source")
    docs.select(col("source"), toks.as("t"))
      .groupBy("source").agg(sum("t").as("avail_tokens"))
      .join(spec, Seq("source"), "full_outer") // spec'd-but-absent surfaces
      .withColumn("avail_tokens", coalesce(col("avail_tokens"), lit(0L)))
      .withColumn("weight_e6", wCol)
      // DECIMAL(38,0)-widened products: weight_e6·budget and planned·10⁶
      // both overflow a long past ~9.2e12-token budgets (realistic for
      // data-constrained scaling) while the oracle auto-widens to
      // HUGEINT — the zipfCheck/significantTerms/d19 discipline
      .withColumn("planned_tokens",
        expr(s"(CAST(weight_e6 AS DECIMAL(38,0)) * ${budgetTokens}L) DIV 1000000"))
      .withColumn("epochs_e6",
        when(col("avail_tokens") > 0,
          expr("(CAST(planned_tokens AS DECIMAL(38,0)) * 1000000) DIV avail_tokens")))
      .withColumn("over_cap",
        coalesce(col("epochs_e6") > capE6, col("planned_tokens") > 0))
      .orderBy("source")
  }

  /** TEMPERATURE-RESAMPLED mixture weights at α = 1/2 — the published
    * multilingual up-sampling recipe (the mT5/XLM-R α-sampling family):
    * sampling weight ∝ n^α flattens the source distribution so
    * low-resource sources train more than their natural share without
    * drowning the head — the DERIVED-weights complement of
    * [[mixtureEpochPlan]] (which takes weights as given; this report's
    * `share_e6` column is exactly its input) and the REPORT twin of
    * [[temperatureMix]] (which applies the same α = 1/2 rule as a
    * document-level thinning under a token budget).
    *
    * α = 1/2 is computed as an EXACT INTEGER SQUARE ROOT: the float
    * `floor(sqrt(n))` seed is corrected ±1 by integer comparison, so a
    * libm that rounds differently at a perfect-square boundary cannot
    * diverge the engines (the general-α float form would leak ulps —
    * pinned rational exponents only, the integer-micros discipline).
    * Shares and the per-source BOOST (temperature share over natural
    * share — > 10⁶ marks an up-sampled source) in floor-div micros,
    * DECIMAL-widened where counts at corpus scale overflow a long
    * product; a source whose natural share floors to 0 reports null
    * boost ("unmeasurable", never ∞-as-garbage).
    *
    * Plan: one map-side-combining per-source count — the only
    * corpus-scale job — then |sources|-row arithmetic with a 1-row
    * broadcast total. Output: `(source, n_docs, w_sqrt, share_e6,
    * natural_share_e6, boost_e6)` ordered by source.
    */
  def temperatureMixWeights(docs: DataFrame): DataFrame = {
    val w = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
      .withColumn("s0", expr("CAST(floor(sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT)"))
      .withColumn("w_sqrt", expr(
        "CASE WHEN (s0 + 1) * (s0 + 1) <= n_docs THEN s0 + 1 " +
          "WHEN s0 * s0 > n_docs THEN s0 - 1 ELSE s0 END"))
      .drop("s0")
    val tot = w.agg(sum("w_sqrt").as("wsum"), sum("n_docs").as("nsum"))
    w.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("w_sqrt"),
        expr("CAST(CAST(w_sqrt AS DECIMAL(38,0)) * 1000000 DIV wsum AS BIGINT)")
          .as("share_e6"),
        expr("CAST(CAST(n_docs AS DECIMAL(38,0)) * 1000000 DIV nsum AS BIGINT)")
          .as("natural_share_e6"))
      .withColumn("boost_e6",
        when(col("natural_share_e6") > 0,
          expr("share_e6 * 1000000 DIV natural_share_e6")))
      .orderBy("source")
  }

  /** PADDING-efficiency audit of length-bucketed batching — the
    * tokens-on-the-floor report that decides a training run's batching
    * strategy: documents are assigned to power-of-two token-length
    * buckets (every doc in a batch is padded to its bucket's cap, the
    * standard bucketed-batching contract), and each bucket reports how
    * much of its padded volume is real tokens.
    *
    * `caps` must be ascending; docs longer than the top cap are TRUNCATED
    * to it (`sum_tokens` counts the clipped length) — the long-tail
    * document is cut, not the batch geometry, which is what every
    * sequence-length-capped trainer does. Efficiency is floor-divided
    * micros `sum_tokens·10⁶ div padded` — exact integers end-to-end.
    *
    * Plan: ONE codegen'd narrow pass (token count + a CASE chain over the
    * literal caps — no join for a ≤dozen-bucket table), then a
    * |caps|-row map-side-combining aggregate. Nothing shuffles but the
    * per-bucket partials. Output: `(cap, n_docs, sum_tokens, padded,
    * waste, eff_e6)` ordered by cap.
    */
  def paddingEfficiency(docs: DataFrame,
                        caps: Seq[Int] = Seq(16, 32, 64, 128)): DataFrame = {
    require(caps.nonEmpty && caps == caps.sorted && caps.distinct == caps,
      s"caps must be ascending and distinct: $caps")
    val toks = size(regexp_extract_all(col("text"),
      lit(s"[^${TextAnalysis.WsClass}]+"), lit(0))).cast("long")
    val cap = caps.init.foldRight(lit(caps.last.toLong): org.apache.spark.sql.Column) {
      (c, rest) => when(toks <= c, lit(c.toLong)).otherwise(rest)
    }
    docs.select(cap.as("cap"), least(toks, lit(caps.last.toLong)).as("t"))
      .groupBy("cap")
      .agg(count(lit(1)).as("n_docs"), sum("t").as("sum_tokens"))
      .withColumn("padded", col("n_docs") * col("cap"))
      .withColumn("waste", col("padded") - col("sum_tokens"))
      .withColumn("eff_e6", expr("(sum_tokens * 1000000) DIV padded"))
      .orderBy("cap")
  }
}
