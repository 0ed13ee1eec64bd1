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
    var vocab = docs
      .select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(wrapped(col("w")).as("syms"), col("cnt"))
      .localCheckpoint(true) // the ONE corpus-scale pass; iterations never re-read docs
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (out.length < numMerges && !exhausted) {
      val arr = split(trim(col("syms")), "  ")
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
      else {
        val (a, b) = (top.head.getString(0), top.head.getString(1))
        out += ((a, b))
        val next = vocab
          .select(replace(col("syms"), lit(pat(a, b)), lit(rep(a, b))).as("syms"),
            col("cnt"))
          .localCheckpoint(true)
        // the superseded checkpoint is never read again (next is fully
        // materialized) — release its block-manager storage now instead of
        // accumulating numMerges cached vocab copies for the session
        unpersistCheckpoint(vocab)
        vocab = next
      }
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
}
