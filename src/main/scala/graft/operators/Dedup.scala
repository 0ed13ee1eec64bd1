package graft.operators

import graft.analyzers.Analyzers
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators over the `documents` table — the four standard
  * tiers of a pre-training dedup pipeline, each designed shuffle-first for
  * 100 TB:
  *
  *  - exact: one hash-keyed aggregate (map-side combine, single shuffle).
  *  - n-gram Jaccard: inverted-index candidate blocking (never all-pairs),
  *    document-frequency-capped postings to bound skew, exact Jaccard verify.
  *  - MinHash + LSH: constant-size signatures (k hashes) per doc, banded
  *    bucket join — the sub-quadratic scale path; candidate volume is tuned
  *    by (bands, rows) independent of corpus size.
  *  - SimHash: one 64-bit signature per doc computed in a single narrow map
  *    (no shuffle at all until the band join), Hamming-ball verify.
  *
  * All hashing is Spark's xxhash64 (seeded by position), so every operator is
  * deterministic run-to-run and cluster-layout-independent.
  */
object Dedup {

  private def toks(c: Column): Column = Analyzers.standardTokens(c)

  /** Distinct word-n-gram shingles of the text (empty for docs shorter than
    * n tokens — they cannot participate in shingle-based dedup). One native
    * codegen'd pass (r17): tokenizer and n-gram kernel each evaluate their
    * child exactly once per row, so no materialization barrier is needed
    * anywhere this is applied (the former HOF formulation re-evaluated the
    * tokenizer once per n-gram slice unless callers shuffled a materialized
    * token column first).
    */
  def shingles(text: Column, n: Int = 3): Column =
    graft.functions.Tokenize.ngrams(toks(text), n, distinct = true)

  /** (doc_id, sh) behind ONE shuffle barrier carrying the RAW TEXT — the
    * multi-consumer entry of every shingle pipeline. The barrier serves two
    * jobs (r17 shape): it spreads the single-file scan across cores, and it
    * is the exchange ReuseExchange hands to every downstream consumer
    * (inverted index + both verify joins). It deliberately ships text, not
    * token or shingle arrays: the shingle representation is ~20× the bytes
    * of its source text, and recomputing the native tokenize→ngram chain
    * per consumer is a narrow codegen'd map — compute scales with cores,
    * shuffle bytes don't (guide §2.2/§2.3). The former two-barrier chain
    * (tokens exchange, then shingles exchange) also tokenized the whole
    * corpus INSIDE the one-task scan stage; here the scan ships raw bytes
    * and all per-row work runs post-exchange, fully parallel.
    */
  private[graft] def withShingles(docs: DataFrame, n: Int): DataFrame =
    graft.util.Spread.byKey(docs.select(col("doc_id"), col("text")), col("doc_id"))
      .select(col("doc_id"), shingles(col("text"), n).as("sh"))

  /** The shingle half of [[withShingles]] over an ALREADY-tokenized
    * (doc_id, toks) frame — the entry point for pipelines that materialize
    * one token pass and feed several consumers (see Pipeline.pretrainCorpus).
    * Native n-gram kernel: no barrier needed between tokens and shingles.
    */
  private[graft] def withShinglesFromTokens(tok: DataFrame, n: Int): DataFrame =
    tok.select(col("doc_id"),
      graft.functions.Tokenize.ngrams(col("toks"), n, distinct = true).as("sh"))

  // ------------------------------------------------------------ exact dedup

  /** Exact dedup: keep the lowest doc_id per identical text (md5 identity).
    * groupBy+min aggregates map-side before the single hash shuffle —
    * strictly cheaper than a row_number window at scale.
    */
  def exact(docs: DataFrame): DataFrame =
    docs.withColumn("content_hash", md5(col("text")))
      .groupBy("content_hash").agg(min("doc_id").as("doc_id"))
      .select("doc_id", "content_hash")

  // --------------------------------------------------- n-gram Jaccard pairs

  /** Near-duplicate pairs by exact n-gram-shingle Jaccard similarity.
    *
    * Candidate generation is an inverted-index self-join: explode shingles,
    * keep postings with document frequency in [2, maxDf] (df=1 can't pair;
    * df>maxDf would quadratically explode on stop-shingles and contributes
    * no recall for near-identical docs, which share many rare shingles),
    * then equi-join postings on the shingle. Verification computes exact
    * Jaccard over the full shingle sets and keeps pairs ≥ threshold.
    *
    * At 100 TB: the join is shuffle-keyed on the shingle; maxDf bounds the
    * per-key fanout (worst case maxDf² candidate rows per shingle), and AQE
    * splits any residual skew. No all-pairs stage exists anywhere.
    */
  /** Shared candidate blocking for the shingle-set verifiers
    * ([[jaccardPairs]], [[containmentPairs]]): inverted index over the
    * shingles, document-frequency cut to df∈[2, maxDf] (df=1 can't pair;
    * df>maxDf would quadratically explode on stop-shingles), then id pairs
    * sharing ≥ minShared blocked shingles. Near-identical docs share
    * dozens, while incidental pairs share 1-2 — at sf0.1 the minShared cut
    * prunes candidates 100× (1.12M → 10k) with zero Jaccard recall loss
    * (measured: every j≥0.8 pair shares ≥8). The count is a map-side-
    * combining aggregate on the same shuffle the distinct needed anyway.
    * Mirrored 1:1 by the oracle's PairsChain CTEs (SparkEntry).
    */
  private[graft] def blockedIdPairs(sh: DataFrame, maxDf: Int, minShared: Int): DataFrame = {
    // Aggregate-then-expand (r17): ONE posting shuffle builds the per-
    // shingle id list (df = list size — sh is per-doc distinct, so each doc
    // posts a shingle at most once), the df window filters it, and the
    // ordered pairs expand NARROWLY from the sorted list (posexplode + tail
    // slice — a<b by sort order). The former formulation reached the same
    // pair multiset through inv⋈keep plus an inv⋈inv self-join: two more
    // joins, two more reads of the posting exchange, and the ~25-char
    // shingle string shipped once PER POSTING where the partial collect_list
    // ships it once per (partition, shingle). Worst-case per-key work is
    // C(df,2) in both shapes (the self-join also fanned a hot shingle's df²
    // pairs inside one task), and maxDf bounds it exactly as before.
    // Hot-key memory bound (r18, guide §5): the list aggregate is the capped
    // kernel — exact df count plus at most maxDf+1 collected ids per key, so
    // a corpus-hot stop-shingle (df ≫ maxDf) costs a counter and a bounded
    // buffer instead of materializing its whole posting list before the df
    // cut (the r17 shape buffered first, filtered after). Every key the df
    // window KEEPS has df ≤ maxDf < cap, so its list is complete — the pair
    // expansion below is unchanged row-for-row.
    val cap = if (maxDf >= Int.MaxValue) Int.MaxValue else maxDf + 1
    val lists = sh.select(col("doc_id"), explode(col("sh")).as("s"))
      .groupBy("s")
      .agg(graft.functions.CappedCollect.ids(col("doc_id"), cap).as("cl"))
      .where(col("cl.df").between(2, maxDf))
      .select(array_sort(col("cl.ids")).as("ids"))
    lists
      .select(col("ids"), posexplode(col("ids")).as(Seq("p", "a_id")))
      .select(col("a_id"), explode(slice(col("ids"), col("p") + 2,
        greatest(size(col("ids")) - col("p") - 1, lit(0)))).as("b_id"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("_shared"))
      .where(col("_shared") >= minShared)
      .select(col("a_id"), col("b_id"))
  }

  def jaccardPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.8,
                   maxDf: Int = 20, minShared: Int = 3): DataFrame =
    // Barriered tokenize→shingle pipeline; ReuseExchange then feeds the
    // inverted index and both verify branches from one shuffle.
    jaccardVerified(withShingles(docs, n), threshold, maxDf, minShared)

  /** [[jaccardPairs]] over an already-tokenized (doc_id, toks) frame —
    * composes with [[withShinglesFromTokens]] so a caller's single
    * materialized token pass serves the dedup leg too.
    */
  def jaccardPairsFromTokens(tok: DataFrame, n: Int = 3, threshold: Double = 0.8,
                             maxDf: Int = 20, minShared: Int = 3): DataFrame =
    jaccardVerified(withShinglesFromTokens(tok, n), threshold, maxDf, minShared)

  private def jaccardVerified(sh: DataFrame, threshold: Double,
                              maxDf: Int, minShared: Int): DataFrame = {
    val pairs = blockedIdPairs(sh, maxDf, minShared)
    // native hash-set kernel; bit-identical to
    // size(array_intersect)/size(array_distinct(concat)) on distinct inputs
    val j = graft.functions.VectorHash.jaccardCol(col("sa"), col("sb"))
    pairs
      .join(sh.select(col("doc_id").as("a_id"), col("sh").as("sa")), "a_id")
      .join(sh.select(col("doc_id").as("b_id"), col("sh").as("sb")), "b_id")
      .select(col("a_id"), col("b_id"), round(j, 6).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** EXACT Jaccard ground truth — no df cap, no minShared cut. Every pair
    * with J > 0 shares at least one shingle, so blocking on "share ≥ 1
    * shingle" with an unbounded document-frequency window is EXACT for any
    * positive threshold: this is the full j ≥ threshold pair set, not an
    * approximation. The cost is the quadratic fan-out on hot shingles the
    * production blocking exists to avoid — GATE/AUDIT SCALE ONLY, the
    * measurement stick the d16 recall entry holds the production paths to
    * (the v11 discipline applied to dedup).
    */
  def exactJaccardPairs(docs: DataFrame, n: Int = 3,
                        threshold: Double = 0.8): DataFrame =
    jaccardVerified(withShingles(docs, n), threshold, Int.MaxValue, 1)

  /** Near-duplicate pairs by n-gram-shingle CONTAINMENT — the asymmetric
    * relation Jaccard misses: a short document quoted or prefix-truncated
    * from a long one shares nearly all of ITS shingles while the union
    * stays large (a 25% excerpt has containment 1.0 but Jaccard 0.25).
    * containment(a, b) = |sh(a) ∩ sh(b)| / min(|sh(a)|, |sh(b)|).
    *
    * Same sub-quadratic pipeline as [[jaccardPairs]] (the
    * [[blockedIdPairs]] chain is literally shared): slim id-pairs through
    * the dedup shuffle, shingle sets re-joined only for the verify, whose
    * `array_intersect`/`least(size)` are codegen'd built-ins.
    *
    * Recall caveat the blocking inherits: the df > maxDf cut drops
    * postings for shingles appearing in more than maxDf documents. For
    * Jaccard that costs nothing (near-identical docs share many RARE
    * shingles), but a short excerpt of heavily-mirrored boilerplate —
    * every shingle popular — can lose all its postings and never become a
    * candidate. When hunting duplicated boilerplate specifically, raise
    * maxDf (candidate volume grows as maxDf² per shingle) or pre-group
    * exact duplicates first so the mirror count collapses.
    */
  def containmentPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.9,
                       maxDf: Int = 20, minShared: Int = 3): DataFrame = {
    val sh = withShingles(docs, n)
    val pairs = blockedIdPairs(sh, maxDf, minShared)
    // candidates share ≥ minShared shingles, so both sets are non-empty by
    // construction — no zero-size guard is needed (matches the oracle SQL)
    val c = size(array_intersect(col("sa"), col("sb"))).cast("double") /
      least(size(col("sa")), size(col("sb"))).cast("double")
    pairs
      .join(sh.select(col("doc_id").as("a_id"), col("sh").as("sa")), "a_id")
      .join(sh.select(col("doc_id").as("b_id"), col("sh").as("sb")), "b_id")
      .select(col("a_id"), col("b_id"), round(c, 6).as("containment"))
      .where(col("containment") >= threshold)
  }

  // ----------------------------------------------------------- MinHash LSH

  /** MinHash signature: element i = min over shingles of xxhash64(i, shingle).
    * A single narrow map per row — k·|shingles| hashes, no shuffle. Native
    * kernel ([[graft.functions.MinHashSigExpr]]) reuses the built-in's XXH64
    * chain (seed 42 → hashInt(i) → hashUTF8String(s)), so signatures are
    * bit-identical to the HOF formulation, including the empty-input edge
    * (empty shingle set → k-element array of nulls, like `array_min` over an
    * empty array) and null-shingle hash-skip.
    */
  def minhashSignature(sh: Column, k: Int = 64): Column =
    graft.functions.VectorHash.minhashCol(sh, k)

  /** MinHash+LSH near-duplicate pairs: band the k-element signature into
    * `bands` groups of k/bands rows, bucket-join docs agreeing on any whole
    * band, then estimate Jaccard as the fraction of agreeing signature
    * positions and keep pairs ≥ threshold.
    *
    * With k=64, bands=16 (r=4), P[candidate] = 1-(1-J⁴)¹⁶: ≈1 for J≥0.8,
    * ≈0.04 for J=0.2 — the classic LSH S-curve. Candidate volume is governed
    * by band-bucket collisions, never by |docs|².
    */
  def minhashPairs(docs: DataFrame, k: Int = 64, bands: Int = 16,
                   threshold: Double = 0.8, shingleN: Int = 3): DataFrame = {
    val r = k / bands
    // The repartition calls are shuffle BARRIERS, not (only) load balancing:
    // without them CollapseProject inlines `sh` into all k signature lambdas
    // and `sig` into every band expression and then through the self-join —
    // the interpreted split/shingle pipeline would re-run per band and per
    // candidate pair (measured: one 20-minute task at sf0.1 vs seconds with
    // barriers). Each barrier materializes the named column exactly once per
    // row; ReuseExchange makes both join sides read a single shuffle.
    val sigs = graft.util.Spread.byKey(withShingles(docs, shingleN)
      .where(size(col("sh")) > 0)
      .select(col("doc_id"), minhashSignature(col("sh"), k).as("sig")), col("doc_id"))
    // Banded rows carry (doc_id, band, key) ONLY: a doc colliding in many
    // bands would otherwise ship its k-element signature once per candidate
    // row through the pair-dedup shuffle. Pairs dedup as two longs, then the
    // signatures re-join from `sigs` (whose repartition shuffle ReuseExchange
    // serves to all three reads) — the jaccardPairs two-phase pattern.
    val banded = bandKeys(sigs, bands, r)
    val pairs = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .dropDuplicates("a_id", "b_id")
    estJaccardVerify(pairs, sigs, sigs, k, threshold)
  }

  /** (doc_id, band, key) LSH band rows of a (doc_id, sig) frame — the
    * banding expression shared by [[minhashPairs]] and
    * [[incrementalMinhashPairs]] (identical banding is what makes their
    * results comparable).
    */
  private def bandKeys(sigs: DataFrame, bands: Int, r: Int): DataFrame =
    sigs.select(col("doc_id"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"), xxhash64(slice(col("sig"), b * r + 1, lit(r))).as("key"))))
          .as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.key"))

  /** Estimate-verify tail shared by the MinHash pair operators: re-join the
    * signatures onto the id-only candidate pairs, estimate Jaccard as the
    * agreeing-position fraction, keep pairs ≥ threshold.
    */
  private def estJaccardVerify(pairs: DataFrame, aSigs: DataFrame,
                               bSigs: DataFrame, k: Int, threshold: Double): DataFrame = {
    val est = size(filter(zip_with(col("siga"), col("sigb"), (x, y) => x === y),
      b => b)).cast("double") / k
    pairs
      .join(aSigs.select(col("doc_id").as("a_id"), col("sig").as("siga")), "a_id")
      .join(bSigs.select(col("doc_id").as("b_id"), col("sig").as("sigb")), "b_id")
      .select(col("a_id"), col("b_id"), round(est, 6).as("est_jaccard"))
      .where(col("est_jaccard") >= threshold)
  }

  // ------------------------------------------------------ incremental dedup

  /** The persisted half of incremental dedup: (doc_id, sig) MinHash
    * signatures of a corpus, computed ONCE at ingest (a narrow map — no
    * shuffle beyond the barrier) and written as the corpus's signature
    * index. Constant-size per doc (k longs) regardless of document length.
    */
  def signatureIndex(docs: DataFrame, k: Int = 64, shingleN: Int = 3): DataFrame =
    withShingles(docs, shingleN)
      .where(size(col("sh")) > 0)
      .select(col("doc_id"), minhashSignature(col("sh"), k).as("sig"))

  /** Incremental MinHash dedup: near-duplicate pairs (a_id = corpus doc,
    * b_id = batch doc) between an already-indexed corpus and a NEW batch —
    * the shape of continuous 100 TB ingest, where re-running pair dedup
    * over (corpus + batch) would rescan everything ever ingested per
    * arrival. Here the corpus contributes only its PERSISTED signature
    * index ([[signatureIndex]]): corpus text is never re-read, the batch
    * side is one narrow signature pass over the new documents, and the
    * banded join's output volume is batch-driven (a corpus band bucket
    * yields candidates only where a batch doc lands in it). Corpus and
    * batch id spaces must be disjoint (append-only ingest ids).
    *
    * Same banding/verify math as [[minhashPairs]] — a batch that collides
    * and estimates ≥ threshold against a corpus doc is exactly what the
    * monolithic operator would have paired.
    */
  def incrementalMinhashPairs(corpusIndex: DataFrame, batch: DataFrame,
                              k: Int = 64, bands: Int = 16, threshold: Double = 0.8,
                              shingleN: Int = 3): DataFrame =
    incrementalPairsFromIndex(corpusIndex, signatureIndex(batch, k, shingleN),
      k, bands, threshold)

  /** [[incrementalMinhashPairs]] when the batch signatures ALREADY live in
    * an index — the read side of streaming signature ingest (e25): both
    * sides are (doc_id, sig) rows, no text is touched anywhere. Same
    * banding/verify math; id spaces must be disjoint.
    */
  def incrementalPairsFromIndex(corpusIndex: DataFrame, batchIndex: DataFrame,
                                k: Int = 64, bands: Int = 16,
                                threshold: Double = 0.8): DataFrame = {
    val corpusSigs = graft.util.Spread.byKey(corpusIndex, col("doc_id"))
    val batchSigs = graft.util.Spread.byKey(batchIndex, col("doc_id"))
    // ids-only through the pair dedup (the minhashPairs two-phase pattern);
    // banding and verify are shared with minhashPairs — identical math is
    // the operator's contract
    val pairs = bandKeys(corpusSigs, bands, k / bands).as("a")
      .join(bandKeys(batchSigs, bands, k / bands).as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .dropDuplicates("a_id", "b_id")
    estJaccardVerify(pairs, corpusSigs, batchSigs, k, threshold)
  }

  // --------------------------------------------------------------- SimHash

  /** 64-bit SimHash of the token stream, one narrow map per row: for each bit
    * position, sum +1/-1 votes of xxhash64(token) bits (token multiplicity
    * weights naturally), then pack the sign vector into a long.
    */
  def simhash(text: Column): Column = simhashFromHashes(transform(toks(text), t => xxhash64(t)))

  /** SimHash from a materialized token-hash array (so callers can put a
    * shuffle barrier between tokenization and the 64-bit vote loop). Native
    * kernel ([[graft.functions.SimHash64Expr]]): one pass over the hashes
    * with 64 integer vote counters — integer sums are exact, so the result
    * equals the per-position HOF loop bit-for-bit.
    */
  def simhashFromHashes(hashes: Column): Column =
    graft.functions.VectorHash.simhashCol(hashes)

  /** SimHash near-duplicate pairs: block on 4 16-bit bands (any pair within
    * Hamming distance ≤ 3 of 64 bits agrees exactly on ≥1 band, by
    * pigeonhole), verify with bit_count(a XOR b) ≤ maxHamming.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    // Same barrier pattern as minhashPairs: materialize token hashes, then
    // the signature, before banding/joining — see the comment there.
    val sigs = graft.util.Spread.byKey(
      graft.util.Spread.byKey(docs.select(col("doc_id"), col("text")), col("doc_id"))
        .select(col("doc_id"),
          simhashFromHashes(transform(toks(col("text")), t => xxhash64(t))).as("sig")),
      col("doc_id"))
    val banded = sigs.select(col("doc_id"), col("sig"),
        explode(transform(sequence(lit(0), lit(3)),
          b => struct(b.as("band"),
            call_function("shiftright", col("sig"), b * 16).bitwiseAND(0xFFFFL).as("key"))))
          .as("bk"))
      .select(col("doc_id"), col("sig"), col("bk.band"), col("bk.key"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        col("a.sig").as("siga"), col("b.sig").as("sigb"))
      .dropDuplicates("a_id", "b_id")
      .select(col("a_id"), col("b_id"),
        bit_count(col("siga").bitwiseXOR(col("sigb"))).cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  /** Fuzzy dedup end-to-end: connected near-duplicates collapse to the
    * minimum doc_id via one iteration of min-propagation over the pair graph
    * (exact for the star/clique shapes planted duplicates form; full
    * connected components would iterate to fixpoint).
    */
  def fuzzyDedupSurvivors(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val rep = pairs.select(col("b_id").as("doc_id"), col("a_id").as("rep"))
      .groupBy("doc_id").agg(min("rep").as("rep"))
    docs.join(rep, Seq("doc_id"), "left_anti").select("doc_id")
  }

  // --------------------------------------------- connected-component clusters

  /** Connected-component canonicalization of a near-duplicate pair graph:
    * every document maps to its cluster representative — the minimum doc_id
    * reachable through dup pairs (itself when it has none). Unlike
    * [[fuzzyDedupSurvivors]]' single min-propagation round (exact only for
    * the star/clique shapes planted dups form), this iterates to fixpoint,
    * so chains a–b, b–c collapse transitively.
    *
    * Each round a node takes the min of its own label, its neighbors'
    * labels, and its label's label (pointer jumping / path halving), so
    * rounds needed grow with log(component diameter), not diameter. One
    * round = a message aggregate (map-side-combining min over the neighbor
    * messages only) joined back to the label table plus the jump join; the
    * edge list materializes once and labels re-checkpoint per round to
    * keep lineage flat. Labels seed at min(self, neighbors) — round 1 of
    * the identity init, collapsed into one aggregate over the edge cache. The lineage-cut strategy is injectable (`cut`): the
    * default ([[graft.util.LineageCut.cut]]) uses a reliable `checkpoint()`
    * whenever the context has a checkpoint dir — the cluster-safe choice,
    * since localCheckpoint blocks die with their executor (lost to failure
    * or dynamic deallocation mid-loop) — and falls back to localCheckpoint
    * in single-JVM runs. This is the simplified form of the alternating
    * large-star/small-star MapReduce CC algorithm; near-dup graphs are
    * shallow (dups of a doc are dups of each other), so the loop terminates
    * in a handful of rounds. Convergence detection is one cheap scalar
    * aggregate per round: the PREVIOUS label rides the label table through
    * the round's join untouched, and the round counts nodes whose label
    * changed — `changed == 0` is a true fixpoint. A label-SUM
    * comparison would be the same cost but could alias two states through
    * Long-overflow wraparound at extreme id scales; the changed-count is
    * bounded by the node count and cannot.
    */
  def dupClusters(docs: DataFrame, pairs: DataFrame, maxIter: Int = 20,
                  cut: DataFrame => DataFrame = graft.util.LineageCut.cut): DataFrame = {
    val e = cut(pairs.select(col("a_id").as("u"), col("b_id").as("v"))
      .unionByName(pairs.select(col("b_id").as("u"), col("a_id").as("v")))
      .repartition(col("u")))
    // Seeded init (r17): lbl₀ = min(u, neighbors) — exactly the state the
    // old identity init (lbl = u) reached after round 1's neighbor-join and
    // aggregate, computed here by ONE map-side-combining aggregate over the
    // already-materialized edge cache instead of a full superstep (join +
    // checkpoint + convergence action). Same fixpoint, one round fewer;
    // star/clique components (the planted-dup shape) now converge in a
    // single checked round.
    var labels = cut(e.groupBy("u")
      .agg(min(least(col("u"), col("v"))).as("lbl")))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // Per-round merge as LEFT JOIN + least (r17): the former
      // label∪neighbor UNION into one aggregate shipped every node's own
      // row through the shuffle alongside the messages and needed the
      // max(_old) trick to recover the previous label; aggregating the
      // messages ALONE and joining them back is the same min over
      // {self, neighbors} with the previous label kept for free, and the
      // aggregate's shuffle carries messages only. (It also sidesteps a
      // Spark constraint-rewrite crash the union form trips when both
      // union children descend from the same checkpointed plan.)
      val nbrMin = e.join(labels.select(col("u").as("_v"), col("lbl")), col("v") === col("_v"))
        .groupBy("u").agg(min("lbl").as("_nl"))
      val stepped = labels.select(col("u"), col("lbl").as("_old"))
        .join(nbrMin, Seq("u"), "left")
        .select(col("u"), least(col("_old"), coalesce(col("_nl"), col("_old"))).as("lbl"),
          col("_old"))
      val jump = stepped.select(col("u").as("_ju"), col("lbl").as("_jl"))
      // convergence rides the checkpoint's own materialization as an
      // observe() metric (r18): the former separate count job cost one
      // scheduled action + plan per round for a number the checkpoint pass
      // already computes
      val obs = org.apache.spark.sql.Observation(
        s"graft-cc-changed-${java.util.UUID.randomUUID.toString.take(8)}")
      val next = cut(stepped.join(jump, col("lbl") === col("_ju"), "left")
        .select(col("u"), least(col("lbl"), coalesce(col("_jl"), col("lbl"))).as("lbl"),
          col("_old"))
        .observe(obs, sum(when(col("lbl") =!= col("_old"), 1L)).as("changed")))
      val changed = obs.get.get("changed") match {
        case Some(n: Number) => n.longValue
        case _ => 0L // null = empty graph: already converged
      }
      converged = changed == 0L
      labels = next.drop("_old")
      iter += 1
    }
    docs.select(col("doc_id"))
      .join(labels.select(col("u").as("doc_id"), col("lbl").as("rep")), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("rep"), col("doc_id")).as("cluster_rep"))
      .withColumn("is_canonical", col("cluster_rep") === col("doc_id"))
  }

  // ------------------------------------------------------- line-level dedup

  /** Boilerplate LINE removal (the C4/RefinedWeb cleaning rule): a non-blank
    * line whose normalized form (lowercased, trimmed) appears in more than
    * `maxDocFrac` of the corpus's documents is page chrome — nav menus,
    * cookie banners, copyright footers — and is dropped from EVERY document;
    * body lines survive in their original order. Output per input document:
    * `(doc_id, n_removed, clean_hash)` where `clean_hash` is the md5 of the
    * re-assembled text (a document whose every line is boilerplate keeps its
    * row with the empty-string hash — corpus row count is preserved).
    *
    * Shuffle plan, sized for 100 TB: the line-frequency pass is ONE
    * map-side-combining hash aggregate keyed on the normalized line; the
    * boilerplate set it yields is tiny by construction (each member must
    * recur across ≥ `maxDocFrac`·N documents, so there can be at most
    * ~1/maxDocFrac·⟨lines per doc⟩ of them) and is broadcast into a
    * LEFT ANTI join against the exploded corpus — the corpus itself never
    * shuffles for the filtering step. The corpus size that anchors the
    * threshold rides along as a broadcast 1-row aggregate (no driver
    * action). Only the per-document re-assembly shuffles doc-keyed rows,
    * and those carry surviving lines only.
    */
  def lineDedup(docs: DataFrame, maxDocFrac: Double = 0.05): DataFrame = {
    val lines = docs
      .select(col("doc_id"), posexplode(split(col("text"), "\n")).as(Seq("pos", "line")))
      .where(trim(col("line")) =!= "")
      .select(col("doc_id"), col("pos"), col("line"), lower(trim(col("line"))).as("norm"))
    val corpusSize = docs.agg(count(lit(1)).as("n_corpus"))
    val boiler = lines.groupBy("norm")
      .agg(countDistinct("doc_id").as("n_docs"))
      .crossJoin(broadcast(corpusSize))
      .where(col("n_docs") > col("n_corpus") * maxDocFrac)
      .select("norm")
    val rebuilt = lines.join(broadcast(boiler), Seq("norm"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x.getField("line")), "\n").as("clean_text"))
    docs.select(col("doc_id"),
        size(filter(split(col("text"), "\n"), x => trim(x) =!= "")).cast("long").as("n_lines"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        md5(coalesce(col("clean_text"), lit(""))).as("clean_hash"))
  }

  // ----------------------------------------------- exact-substring (spans)

  /** Exact-substring dedup — the remaining standard tier (Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better",
    * arXiv:2107.06499): maximal spans of ≥ k consecutive tokens whose every
    * k-token window occurs MORE THAN ONCE in the corpus, counting
    * multiplicity (a within-document repeat counts — the paper's criterion
    * is "the substring appears again anywhere"). The paper builds a
    * corpus-wide suffix array; this is the shuffle-first re-expression:
    * POSITIONED k-shingle postings key one hash shuffle on the shingle
    * (df ≥ 2 postings are exactly the positions inside some repeated
    * ≥k-token substring), and surviving positions merge per document into
    * maximal spans with a gaps-and-islands window — no suffix structure,
    * same span set. Output `(doc_id, start_tok, end_tok, n_tokens)`,
    * 0-based inclusive token positions; every span has n_tokens ≥ k.
    *
    * What a caller does with the spans (remove all-but-one occurrence, flag
    * documents, count duplicated tokens) is policy; this operator is the
    * detection pass the policies share.
    *
    * At 100 TB: the occurrence count is a map-side-combining aggregate
    * keyed on the shingle (only counts cross the shuffle — stop-shingle
    * skew compresses map-side); the position-mark join re-shuffles postings
    * once on the same key with AQE splitting residual skew; the island
    * merge shuffles only SURVIVING positions keyed by doc_id — O(repeated
    * positions), not O(corpus). Nothing is all-pairs and nothing driver-side.
    */
  def repeatedSpans(docs: DataFrame, k: Int = 8): DataFrame = {
    require(k >= 2, s"span window k must be >= 2, got $k")
    // barrier ships raw text; the native tokenize→ngram chain runs fully
    // parallel post-exchange (the r17 withShingles argument)
    val pos = graft.util.Spread.byKey(
        docs.select(col("doc_id"), col("text")), col("doc_id"))
      .select(col("doc_id"),
        posexplode(TextAnalysis.ngrams(toks(col("text")), k)).as(Seq("p", "s")))
    val repeated = pos.groupBy("s").agg(count(lit(1)).as("occ"))
      .where(col("occ") >= 2).select("s")
    val hits = pos.join(repeated, "s").select(col("doc_id"), col("p"))
    val island = col("p") - row_number().over(
      Window.partitionBy(col("doc_id")).orderBy(col("p")))
    hits.withColumn("g", island)
      .groupBy(col("doc_id"), col("g"))
      .agg(min(col("p")).as("start_tok"),
        (max(col("p")) + lit(k - 1)).as("end_tok"),
        (max(col("p")) - min(col("p")) + lit(k)).cast("long").as("n_tokens"))
      .drop("g")
  }

  /** Per-document duplicated-token load: the fraction of each document's
    * tokens lying inside some repeated ≥k-token span ([[repeatedSpans]]) —
    * the corpus-health number the Lee et al. pipeline reports and that
    * removal/flagging policies threshold on ("drop documents more than X%
    * duplicated"). Spans are maximal islands and therefore disjoint, so the
    * per-doc token sum is exact, never double-counted. Output
    * `(doc_id, n_tokens, dup_tokens, dup_frac)` for EVERY document
    * (span-free docs report 0); dup_frac rounded 6dp.
    *
    * Plan: [[repeatedSpans]]' output is already tiny (one row per maximal
    * span), so the load is one map-side-combining sum keyed on doc_id plus
    * a doc-keyed join against a narrow (doc_id, token-count) projection —
    * both shuffles carry metadata-scale rows, not text.
    */
  def dupTokenLoad(docs: DataFrame, k: Int = 8): DataFrame = {
    val spanSum = repeatedSpans(docs, k)
      .groupBy("doc_id").agg(sum("n_tokens").as("dup_tokens"))
    docs.select(col("doc_id"), size(toks(col("text"))).cast("long").as("n_tokens"))
      .join(spanSum, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        round(coalesce(col("dup_tokens"), lit(0L)) /
          greatest(col("n_tokens"), lit(1L)), 6).as("dup_frac"))
  }

  /** Exact-substring REMOVAL — the policy tier whose output is the Lee et
    * al. pipeline's actual product, the REWRITTEN corpus: each repeated
    * maximal span ([[repeatedSpans]]) keeps its FIRST occurrence and every
    * later occurrence is cut from its document, order preserved. Span
    * identity is the span's token content (md5 of the joined tokens);
    * "first" is the lowest (doc_id, start_tok) — deterministic, no RNG.
    *
    * Policy caveat (documented, deliberate): keying on the MAXIMAL island's
    * content means two occurrences of the same repeated substring whose
    * islands differ by boundary tokens (a shared adjacent word extends one
    * island but not the other) form distinct keys and both survive — an
    * under-removal relative to true suffix-array substring dedup, bounded
    * by island boundary tokens. The detection tier ([[repeatedSpans]] /
    * [[dupTokenLoad]]) is unaffected; policies needing exact-substring
    * granularity use [[removeRepeatedWindows]], whose election runs over
    * the constituent k-token windows and closes exactly this caveat.
    * Output one row per document, [[lineDedup]]'s reporting shape:
    * `(doc_id, n_tokens, removed_tokens, clean_hash)` where clean_hash is
    * md5 of the space-rejoined surviving tokens (text-scale results stay
    * distributed; only hashes reach the comparison gate).
    *
    * At 100 TB: detection is [[repeatedSpans]]' blocked chain; the
    * first-occurrence election is a map-side-combining
    * `min(struct(doc_id, start_tok))` per span-content key plus a join —
    * a metadata-scale shuffle (one row per detected span, not per token)
    * with no sort over the content key, so a viral boilerplate span
    * combines down instead of straggling one reducer; the rewrite is a
    * narrow per-row array filter of each doc's
    * tokens against its own (tiny, disjoint) cut list, joined doc-keyed.
    * Documents with no cuts never materialize a rewrite — they flow
    * through the left join untouched.
    */
  /** Exact-substring removal at TRUE window granularity — the suffix-array-
    * faithful twin of [[removeRepeatedSpans]] that closes its documented
    * under-removal caveat. The election runs over the constituent k-token
    * WINDOWS (the posting tier itself), not over maximal-island content:
    * each repeated window keeps its FIRST occurrence (lowest (doc_id, p)
    * per window CONTENT) and every later occurrence becomes a cut over its
    * k tokens. Two occurrences of the same repeated substring whose maximal
    * islands differ by a boundary token therefore share their interior
    * window keys and the later one IS cut — the case [[removeRepeatedSpans]]
    * deliberately lets survive. The flip side is inherent to window
    * granularity (as with suffix-interval removal): a cut window adjacent
    * to a kept one removes up to k−1 tokens of the kept occurrence's edge.
    *
    * Per-document cut windows are merged into disjoint intervals (overlap
    * OR adjacency — token-set union either way) before the rewrite, so
    * removed_tokens is exact, never double-counted. Output is
    * [[removeRepeatedSpans]]'s reporting shape:
    * `(doc_id, n_tokens, removed_tokens, clean_hash)`.
    *
    * At 100 TB: detection and election are ONE map-side-combining
    * aggregate on the window string — `min(struct(doc_id, p))` elects the
    * first occurrence inside the same partial-aggregated shuffle the
    * occurrence count pays, so a viral boilerplate window with 10⁷
    * occurrences combines down to one row per partition instead of
    * funnelling every occurrence into a single task's sort (the
    * row_number-over-content-key alternative is that straggler); the
    * interval merge shuffles only CUT positions keyed by doc_id; the
    * rewrite is the narrow per-doc array filter (cut-free docs flow through
    * the left join untouched). DedupPropertySpec pins the plan shape: no
    * Window node partitions on the content key.
    */
  def removeRepeatedWindows(docs: DataFrame, k: Int = 8): DataFrame = {
    require(k >= 2, s"span window k must be >= 2, got $k")
    // one raw-text barrier; tokens recompute natively per consumer (the
    // rewrite join and the posting explode) instead of shuffling arrays
    val txt = graft.util.Spread.byKey(
      docs.select(col("doc_id"), col("text")), col("doc_id"))
    val tok = txt.select(col("doc_id"), toks(col("text")).as("t"))
    val pos = txt.select(col("doc_id"),
      posexplode(TextAnalysis.ngrams(toks(col("text")), k)).as(Seq("p", "s")))
    // detection + first-occurrence election in ONE combine-safe aggregate:
    // min(struct(doc_id, p)) is the lexicographically-first occurrence of
    // each repeated window content — it survives, every other occurrence
    // is a cut. No sort over the content key anywhere, so a hot window
    // string partial-aggregates map-side instead of straggling one reducer.
    val repeated = pos.groupBy("s")
      .agg(count(lit(1)).as("occ"), min(struct(col("doc_id"), col("p"))).as("keep"))
      .where(col("occ") >= 2).select("s", "keep")
    val cutPos = pos.join(repeated, "s")
      .where(col("doc_id") =!= col("keep.doc_id") || col("p") =!= col("keep.p"))
      .select(col("doc_id"), col("p"))
    // merge per-doc cut windows [p, p+k-1] into disjoint intervals:
    // a window starting within k of its predecessor overlaps or abuts it
    val byDoc = Window.partitionBy("doc_id").orderBy(col("p"))
    val cuts = cutPos
      .withColumn("new_isl",
        when(col("p") - lag(col("p"), 1).over(byDoc) <= k, 0).otherwise(1))
      .withColumn("g", sum(col("new_isl")).over(byDoc))
      .groupBy(col("doc_id"), col("g"))
      .agg(min(col("p")).as("start_tok"), (max(col("p")) + lit(k - 1)).as("end_tok"))
      .groupBy("doc_id")
      .agg(collect_list(struct(col("start_tok"), col("end_tok"))).as("cut"),
        sum(col("end_tok") - col("start_tok") + 1).as("removed_tokens"))
    tok.join(cuts, Seq("doc_id"), "left")
      .select(col("doc_id"), size(col("t")).cast("long").as("n_tokens"),
        coalesce(col("removed_tokens"), lit(0L)).as("removed_tokens"),
        md5(when(col("cut").isNull, array_join(col("t"), " "))
          .otherwise(array_join(
            filter(col("t"), (_, i) =>
              !exists(col("cut"), c =>
                i >= c.getField("start_tok") && i <= c.getField("end_tok"))),
            " ")))
          .as("clean_hash"))
  }

  def removeRepeatedSpans(docs: DataFrame, k: Int = 8): DataFrame = {
    val tok = graft.util.Spread.byKey(
        docs.select(col("doc_id"), col("text")), col("doc_id"))
      .select(col("doc_id"), toks(col("text")).as("t"))
    // span content key: re-join the span's tokens from the doc's own
    // materialized token array (slice is 1-based; spans are inclusive)
    val keyed = repeatedSpans(docs, k).join(tok, "doc_id")
      .select(col("doc_id"), col("start_tok"), col("end_tok"), col("n_tokens"),
        md5(array_join(slice(col("t"), (col("start_tok") + 1).cast("int"),
          col("n_tokens").cast("int")), " ")).as("span_key"))
    // first-occurrence election per span content as a map-side-combining
    // min(struct) aggregate + join — same semantics as a
    // row_number-over-span_key window (lexicographic (doc_id, start_tok)
    // order), but a viral span never funnels into one task's sort
    val firstBySpan = keyed.groupBy("span_key")
      .agg(min(struct(col("doc_id"), col("start_tok"))).as("keep"))
    val cuts = keyed.join(firstBySpan, "span_key")
      .where(col("doc_id") =!= col("keep.doc_id") ||
        col("start_tok") =!= col("keep.start_tok"))
      .groupBy("doc_id")
      .agg(collect_list(struct(col("start_tok"), col("end_tok"))).as("cut"),
        sum("n_tokens").as("removed_tokens"))
    tok.join(cuts, Seq("doc_id"), "left")
      .select(col("doc_id"), size(col("t")).cast("long").as("n_tokens"),
        coalesce(col("removed_tokens"), lit(0L)).as("removed_tokens"),
        md5(when(col("cut").isNull, array_join(col("t"), " "))
          .otherwise(array_join(
            filter(col("t"), (_, i) =>
              !exists(col("cut"), c =>
                i >= c.getField("start_tok") && i <= c.getField("end_tok"))),
            " ")))
          .as("clean_hash"))
  }

  /** Shingle document-frequency PROFILE — the knob-setting screen behind
    * every df-capped blocking decision in this file: per df stratum, how
    * many distinct shingles live there, how many postings they carry, and
    * the PAIR MASS they would generate unblocked (Σ C(df, 2) — the exact
    * quadratic bill a candidate generator pays for that stratum). The
    * report that turns "df ∈ [2, 20]" from folklore into a measured
    * trade: the hot tail is typically a sliver of postings carrying
    * almost all pair mass, and this shows exactly where the knee is.
    *
    * One corpus tokenize + explode (the only data-scale job), a per-
    * shingle count (hash keys — uniform), then a ≤5-row aggregate. All
    * exact integers; `pair_bound` floor-divides df·(df−1)/2 (always
    * integral, DIV keeps it long).
    */
  def shingleDfProfile(docs: DataFrame, n: Int = 3): DataFrame = {
    val inv = withShingles(docs, n)
      .select(col("doc_id"), explode(col("sh")).as("s"))
    val dft = inv.groupBy("s").agg(count(lit(1)).as("df"))
    val bucket = when(col("df") === 1, "df=1")
      .when(col("df") <= 5, "df=2-5")
      .when(col("df") <= 20, "df=6-20")
      .when(col("df") <= 100, "df=21-100")
      .otherwise("df=100+")
    dft.select(bucket.as("bucket"), col("df"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_shingles"), sum("df").as("n_postings"),
        // DECIMAL-widened product: df·(df−1) wraps a long past df ≈ 3×10⁹
        // (a boilerplate shingle in a 10¹⁰-doc corpus); the per-stratum
        // C(df,2) itself fits the long result
        sum(expr("CAST(df AS DECIMAL(38,0)) * (df - 1) DIV 2")).as("pair_bound"))
      .orderBy("bucket")
  }

  /** Dedup ROI report — the audit that justifies (or kills) a dedup pass
    * before anyone runs it at 100 TB: the cluster-SIZE histogram of the
    * connected-component closure, with the bytes a keep-one-per-cluster
    * policy would reclaim. `chars_saved` charges every NON-canonical
    * member's stored length (the d6 canonical rule: the representative
    * stays), so Σ chars_saved over the report is exactly the corpus
    * shrinkage the p7 survivor pass delivers.
    *
    * Plan: the |members|-row closure joins the corpus projection (doc_id,
    * n_chars — 16 B rows, never text), then two metadata-scale aggregates
    * (per-cluster, then per-size). Everything exact integers. Output:
    * `(size, n_clusters, chars_saved)` ordered by size.
    */
  def dedupRoi(docs: DataFrame, clusters: DataFrame): DataFrame =
    clusters
      .join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
      .groupBy("cluster_rep")
      .agg(count(lit(1)).as("size"),
        sum(when(col("doc_id") =!= col("cluster_rep"), col("n_chars"))
          .otherwise(0L)).as("extra"))
      .groupBy("size")
      .agg(count(lit(1)).as("n_clusters"), sum("extra").as("chars_saved"))
      .orderBy("size")

  /** LSH BAND PLANNING — price the (bands, rows-per-band) choice BEFORE
    * anyone pays for it: the third leg of the dedup measure-first
    * trilogy (d19 prices the blocking df cap, d16 measures delivered
    * recall, this prices the [[minhashPairs]] S-curve itself). For every
    * factorization b·r = `k`, the candidate probability at similarity s
    * is the textbook 1 − (1 − sʳ)ᵇ; integrating it below the target
    * threshold gives the expected FALSE-POSITIVE mass (candidates the
    * verifier must reject) and 1 − p above it the FALSE-NEGATIVE mass
    * (true pairs the bucketing never surfaces). Reported per plan in
    * round-6 micros over a fixed s = 0.05..0.95 grid (rational grid
    * points, so both engines evaluate identical inputs; pow/round-6 is
    * the t11 libm discipline), with `best` flagging the minimum
    * fp + fn (ties to fewer bands — cheaper bucketing).
    *
    * Everything is metadata-scale (|divisors of k| × 19 grid rows) —
    * this is the planning table a 100 TB dedup pass reads FIRST, not a
    * corpus job. Output: `(bands, rows, fp_e6, fn_e6, total_e6, best)`
    * ordered by bands.
    */
  def lshBandPlan(spark: org.apache.spark.sql.SparkSession, k: Int = 64,
                  thresholdE2: Int = 80): DataFrame = {
    require(k >= 2, s"k must be >= 2: $k")
    require(thresholdE2 > 0 && thresholdE2 < 100 && thresholdE2 % 5 == 0,
      s"thresholdE2 must be a grid multiple of 5 in (0, 100): $thresholdE2")
    import spark.implicits._
    val plans = (1 to k).filter(b => k % b == 0 && b < k && k / b > 1)
      .map(b => (b.toLong, (k / b).toLong))
    val grid = (1 to 19).map(i => i.toLong)
    val df = plans.toDF("bands", "rows")
      .crossJoin(grid.toDF("s20"))
      .withColumn("p", lit(1.0) - pow(lit(1.0) -
        pow(col("s20").cast("double") / 20.0, col("rows").cast("double")),
        col("bands").cast("double")))
    df.groupBy("bands", "rows")
      .agg(
        round(avg(when(col("s20") < thresholdE2 / 5, col("p"))
          .otherwise(lit(null))) * 1e6, 0).cast("long").as("fp_e6"),
        round(avg(when(col("s20") >= thresholdE2 / 5, lit(1.0) - col("p"))
          .otherwise(lit(null))) * 1e6, 0).cast("long").as("fn_e6"))
      .withColumn("total_e6", col("fp_e6") + col("fn_e6"))
      .withColumn("best",
        struct(col("total_e6"), col("bands")) ===
          min(struct(col("total_e6"), col("bands")))
            .over(org.apache.spark.sql.expressions.Window.partitionBy()))
      .orderBy("bands")
  }
}
