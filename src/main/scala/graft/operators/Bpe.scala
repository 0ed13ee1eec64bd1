package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair encoding with LEARNED merges — the real-BPE upgrade over
  * [[TextAnalysis.tokenCounts]]'s regex pre-tokenizer: the merge table is
  * TRAINED on the corpus (Sennrich et al., "Neural Machine Translation of
  * Rare Words with Subword Units" — the published algorithm every
  * production tokenizer descends from), then broadcast into a pure
  * codegen'd encode expression, so the token counts that drive the
  * pipeline's budget decisions (p4/p5/p8) come from an actual learned
  * subword vocabulary, not an approximation.
  *
  * Training is the classic iteration — count adjacent symbol pairs, merge
  * the most frequent, repeat — run over the WORD-FREQUENCY table, not the
  * corpus: BPE statistics are a pure function of (distinct word, count)
  * (the standard trick — HF/``subword-nmt`` train exactly this way), and
  * at 100 TB the corpus collapses to that metadata-scale vocabulary in ONE
  * map-side-combining aggregate; every merge iteration then shuffles
  * |vocab| rows, never corpus rows, and collects exactly ONE (pair, count)
  * row — the broadcast-stats pattern. Intra-word only (no end-of-word
  * marker): counts feed budget gates, not generation, so word-final
  * distinction buys nothing here.
  *
  * Encoding applies the merges IN LEARNED ORDER as nested `replace`
  * calls over the [[wrapped]] symbol string — one codegen'd expression,
  * no UDF, no driver loop at encode time. Determinism: pair counts are
  * exact longs; arg-max ties break (count desc, left asc, right asc), a
  * rule any engine reproduces bit-identically.
  */
object Bpe {

  /** Wrapped symbol-string form: every symbol carries its OWN leading and
    * trailing space — `"abc"` → `" a  b  c "` — so `replace(" a  b ",
    * " ab ")` merges every non-overlapping adjacent (a,b) pair
    * left-to-right in ONE pass with exact BPE semantics: because no two
    * symbols SHARE a delimiter, a run `a a a a` merges pairwise to
    * `aa aa` in a single replace (a single-space encoding would consume
    * the shared space and stall after the first pair), and a symbol
    * boundary can never false-match inside a longer symbol (every
    * occurrence of the pattern's inner "␣␣" is a true symbol gap).
    */
  private[operators] def wrapped(word: Column): Column =
    regexp_replace(word, "(.)", " $1 ")

  private def pat(a: String, b: String): String = s" $a  $b "
  private def rep(a: String, b: String): String = s" $a$b "

  /** The learned-merge fold over a word column: nested codegen'd
    * `replace`s in learned order, returning the wrapped symbol string.
    */
  private def applyMerges(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(wrapped(word)) { case (acc, (a, b)) =>
      replace(acc, lit(pat(a, b)), lit(rep(a, b)))
    }

  /** Encode a word under `merges`: the symbol array after every merge has
    * applied ("lowest" under merges (l,o),(lo,w) → [low, e, s, t]).
    * Composable with higher-order functions — `word` may be a lambda
    * variable, so per-doc token counts stay one narrow projection.
    */
  def encode(word: Column, merges: Seq[(String, String)]): Column =
    split(trim(applyMerges(word, merges)), "  ")

  /** Train up to `numMerges` merges on `docs`' `text` column (analyzed
    * with the corpus-standard tokenizer). Stops early when no adjacent
    * pair occurs at least twice — every remaining pair is noise. Returns
    * merges in learned (priority) order.
    *
    * Per iteration: one |vocab|-row pair-count aggregate (collecting the
    * single top row) and one eager localCheckpoint of the re-merged vocab
    * (truncating the replace lineage — 2 metadata-scale jobs per merge,
    * regardless of corpus size).
    */
  def trainMerges(docs: DataFrame, numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 0, s"numMerges must be >= 0: $numMerges")
    val vocab = docs
      .select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(wrapped(col("w")).as("syms"), col("cnt"))
      .localCheckpoint(true) // the ONE corpus-scale pass; iterations never re-read docs
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (out.length < numMerges && !exhausted) {
      // ONE job per merge (r18): the learned merges apply INLINE over the
      // single checkpointed vocab — replace() composed left-to-right is
      // exactly the stepwise re-merge the former per-iteration checkpoint
      // materialized, so the counted symbols (and every selected pair) are
      // identical, while the second scheduled job per merge (the
      // localCheckpoint write) disappears. Re-evaluating ≤numMerges cheap
      // replaces per row per iteration is the price; this gate runs at
      // tens of merges by contract (production counts use the local
      // trainer), where scheduling dominated.
      val syms = out.foldLeft(col("syms")) { case (c, (a, b)) =>
        replace(c, lit(pat(a, b)), lit(rep(a, b))) }
      val arr = split(trim(syms), "  ")
      val top = vocab
        .where(size(arr) >= 2)
        .select(col("cnt"), explode(transform(sequence(lit(0), size(arr) - 2),
          j => struct(element_at(arr, j + 1).as("a"),
            element_at(arr, j + 2).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("cnt").as("c"))
        .orderBy(col("c").desc, col("a"), col("b"))
        .head(1)
      if (top.isEmpty || top.head.getLong(2) < 2) exhausted = true
      else out += ((top.head.getString(0), top.head.getString(1)))
    }
    unpersistCheckpoint(vocab)
    out.toList
  }

  /** Drop the block-manager storage behind an EAGER localCheckpoint. Only
    * safe once the checkpointed data is dead — the truncated lineage makes
    * it unrecomputable. (Dataset.unpersist only covers cacheManager
    * entries, so the checkpoint RDD is unpersisted directly.)
    */
  private def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    }

  // ------------------------------------------- driver-local merge loop

  /** UTF-8 byte order — what Spark's string `orderBy` compares (binary
    * UTF8String order), reproduced locally so tie-breaks hash-match the
    * distributed trainer beyond ASCII.
    */
  private def utf8Lt(x: String, y: String): Boolean = {
    val (a, b) = (x.getBytes("UTF-8"), y.getBytes("UTF-8"))
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    a.length < b.length
  }

  /** Train merges at PRODUCTION merge counts: ONE distributed pass
    * collapses the corpus to the word-frequency table (metadata-scale by
    * the header argument — BPE statistics are a pure function of it), and
    * the Sennrich iteration then runs DRIVER-LOCAL over that table —
    * exactly how ``subword-nmt``/HF trainers execute. [[trainMerges]]'s
    * 2-scheduled-jobs-per-merge loop is the right gate for tens of merges
    * but pure scheduling overhead at a real tokenizer's 32k: the local
    * loop does the identical counting arithmetic (exact long pair counts,
    * overlap-inclusive adjacency, ties count desc then UTF-8-binary
    * left/right asc, stop below count 2 — spec-pinned to hash-match the
    * distributed trainer merge-for-merge) with zero per-iteration jobs.
    */
  def trainMergesLocal(docs: DataFrame, numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 0, s"numMerges must be >= 0: $numMerges")
    val vocab = docs
      .select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    trainMergesOnVocab(vocab.toSeq, numMerges)
  }

  /** One word's symbols after a merge is applied left-to-right
    * non-overlapping — the array form of the single-pass `replace`
    * semantics (shared by the local trainer and [[encodeWordLocal]]).
    */
  private def applyMergeLocal(syms: Array[String], a: String, b: String): Array[String] = {
    if (syms.length < 2) return syms
    val merged = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        merged += a + b; i += 2
      } else { merged += syms(i); i += 1 }
    }
    merged.toArray
  }

  /** Driver-side encode of ONE word — the same fold [[encode]] computes
    * per row, as a plain loop (used to build the broadcast vocabulary
    * table of [[encodeByVocab]] and for spot checks).
    */
  private[graft] def encodeWordLocal(word: String, merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(word.map(_.toString).toArray) { case (syms, (a, b)) =>
      applyMergeLocal(syms, a, b)
    }.toSeq

  /** Encode a word column under a LONG merge table: encoding is a pure
    * function of the word, so the corpus' DISTINCT words — metadata-scale
    * by the header argument — are encoded ONCE driver-side and the corpus
    * receives its token arrays through a BROADCAST equi-join (appended as
    * `tokens`). The nested-replace [[encode]] is the right form for short
    * merge tables (pure codegen, no join, composes into lambdas), but its
    * expression tree grows with |merges| and a few hundred nested
    * replaces overflow the column converter's recursion — a production
    * tokenizer's 32k-merge table is far past that, and THIS is its encode
    * path: O(|vocab|) driver work, one broadcast, zero per-row merge
    * loops. Words joined against must appear in `df`'s own vocabulary by
    * construction; encoding NEW data reuses the table and falls back to
    * per-char symbols for out-of-vocabulary words (left outer join).
    */
  def encodeByVocab(df: DataFrame, wordCol: String,
                    merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val words = df.select(col(wordCol)).distinct().as[String].collect()
    val table = words.toSeq.map(w => (w, encodeWordLocal(w, merges)))
      .toDF(wordCol, "tokens")
    df.join(broadcast(table), Seq(wordCol), "left")
      .withColumn("tokens", coalesce(col("tokens"),
        split(trim(wrapped(col(wordCol))), "  ")))
  }

  /** Per-language tokenizer FERTILITY — the production tokenizer-eval
    * statistic (tokens per word by language): a tokenizer trained on one
    * distribution over-fragments the others, and fertility is the number
    * that shows it (HF/XLM-R tokenizer audits report exactly this table).
    * Output per lang: n_docs, n_words (corpus-standard tokens), n_tokens
    * (BPE symbols under `merges`), fertility = n_tokens/n_words as the
    * exact HALF_UP 6-decimal integer division ([[TextAnalysis.roundDiv6]]
    * — both engines derive the identical double from identical longs).
    *
    * Plan: ONE tokenize pass behind a shuffle barrier (the t17/minhash
    * CollapseProject rule — `words` and the per-word encode both read the
    * materialized array), per-doc counts fold map-side into the ≤|langs|
    * group rows. The encode is the codegen'd nested-replace (gate-scale
    * merge tables); at production merge counts swap in [[encodeByVocab]]
    * — the aggregate is unchanged.
    */
  def fertilityByLang(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val tok = docs
      .select(col("doc_id"), col("lang"), TextAnalysis.tokens(col("text")).as("toks"))
      .repartition(col("doc_id"))
    tok.select(col("lang"),
        size(col("toks")).cast("long").as("w"),
        aggregate(transform(col("toks"), w => size(encode(w, merges))),
          lit(0L), (acc, x) => acc + x).as("t"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("w").as("n_words"),
        sum("t").as("n_tokens"))
      .select(col("lang"), col("n_docs"), col("n_words"), col("n_tokens"),
        when(col("n_words") > 0,
          TextAnalysis.roundDiv6(col("n_tokens"), col("n_words")))
          .otherwise(lit(0.0)).as("fertility"))
  }

  /** The in-memory Sennrich loop over a (word, count) table. */
  private[graft] def trainMergesOnVocab(vocab: Seq[(String, Long)],
                                            numMerges: Int): Seq[(String, String)] = {
    // Incremental Sennrich loop (r17): the previous form recounted EVERY
    // adjacent pair of EVERY word per merge — O(corpus symbols) per merge,
    // the dominant driver cost of a production-merge-count train (t19 runs
    // to exhaustion under a 5000-merge cap). Here pair counts live in one
    // mutable table maintained incrementally: a merge touches only the
    // words that contain its pair (tracked by an inverted index), and the
    // next top pair pops from an ordered candidate set. Selection
    // semantics are unchanged and spec-pinned: exact long counts,
    // overlap-inclusive adjacency, ties count desc then UTF-8-binary
    // left/right asc, stop below count 2.
    import scala.collection.mutable
    val words: Array[(Array[String], Long)] =
      vocab.map { case (w, c) => (w.map(_.toString).toArray, c) }.toArray
    val symsOf = mutable.ArrayBuffer[Array[String]](words.map(_._1): _*)
    val counts = mutable.HashMap.empty[(String, String), Long]
    val where = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    // candidate order: count desc, then left/right UTF-8 asc — head = top
    val byRank = new java.util.TreeSet[((String, String), Long)](
      new java.util.Comparator[((String, String), Long)] {
        def compare(x: ((String, String), Long), y: ((String, String), Long)): Int = {
          if (x._2 != y._2) return if (x._2 > y._2) -1 else 1
          if (x._1._1 != y._1._1) return if (utf8Lt(x._1._1, y._1._1)) -1 else 1
          if (x._1._2 != y._1._2) return if (utf8Lt(x._1._2, y._1._2)) -1 else 1
          0
        }
      })
    def bump(k: (String, String), idx: Int, delta: Long): Unit = {
      val old = counts.getOrElse(k, 0L)
      if (old != 0L) { byRank.remove((k, old)); () }
      val nw = old + delta
      if (nw == 0L) { counts.remove(k); () }
      else { counts.update(k, nw); byRank.add((k, nw)); () }
      if (delta > 0) { where.getOrElseUpdate(k, mutable.Set.empty) += idx; () }
    }
    var wi = 0
    while (wi < words.length) {
      val (syms, cnt) = (symsOf(wi), words(wi)._2)
      var i = 0
      while (i < syms.length - 1) { bump((syms(i), syms(i + 1)), wi, cnt); i += 1 }
      wi += 1
    }
    val out = mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (out.length < numMerges && !exhausted) {
      if (byRank.isEmpty || byRank.first()._2 < 2L) exhausted = true
      else {
        val (a, b) = byRank.first()._1
        out += ((a, b))
        val touched = where.getOrElse((a, b), mutable.Set.empty).toArray
        java.util.Arrays.sort(touched)
        touched.foreach { idx =>
          val cnt = words(idx)._2
          val oldSyms = symsOf(idx)
          var i = 0
          while (i < oldSyms.length - 1) {
            val k = (oldSyms(i), oldSyms(i + 1))
            bump(k, idx, -cnt)
            where.get(k).foreach { s => s -= idx; () }
            i += 1
          }
          val newSyms = applyMergeLocal(oldSyms, a, b)
          symsOf(idx) = newSyms
          i = 0
          while (i < newSyms.length - 1) { bump((newSyms(i), newSyms(i + 1)), idx, cnt); i += 1 }
        }
      }
    }
    out.toList
  }
}
