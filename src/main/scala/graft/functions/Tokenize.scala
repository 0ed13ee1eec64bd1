package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst tokenizer expressions — the engine's hottest scalar path
  * (Q1 scoring, dedup shingling, every text-analysis operator tokenizes).
  *
  * The Column-pipeline equivalent, `filter(split(lower(c), regex), …)`,
  * evaluates interpreted (higher-order functions have no codegen) and
  * `UTF8String.split` recompiles the regex Pattern on every row. These
  * expressions replace that with a single allocation-light codepoint scan,
  * participate in whole-stage codegen via a static-call `doGenCode`, and are
  * registered for SQL users through [[GraftExtensions]]
  * (`SparkSessionExtensions.injectFunction`).
  *
  * Token semantics are bit-identical to the regex pipeline (spec-asserted,
  * including supplementary codepoints): lowercase, then split on runs of
  * non-(letter|number) — the `standard`-analyzer approximation of
  * SURVEY.md §1.2 (reference: data_catalog/configuration_const.py:30-38) —
  * or non-letter for the uri_analyzer (reference: configuration_const.py:68-84).
  */
object Tok {

  /** \p{L} ∪ \p{N} (all letter and number categories, not just Nd). */
  private def isLetterOrNumber(cp: Int): Boolean = {
    val t = Character.getType(cp)
    t == Character.UPPERCASE_LETTER || t == Character.LOWERCASE_LETTER ||
      t == Character.TITLECASE_LETTER || t == Character.MODIFIER_LETTER ||
      t == Character.OTHER_LETTER || t == Character.DECIMAL_DIGIT_NUMBER ||
      t == Character.LETTER_NUMBER || t == Character.OTHER_NUMBER
  }

  private def isLetter(cp: Int): Boolean = {
    val t = Character.getType(cp)
    t == Character.UPPERCASE_LETTER || t == Character.LOWERCASE_LETTER ||
      t == Character.TITLECASE_LETTER || t == Character.MODIFIER_LETTER ||
      t == Character.OTHER_LETTER
  }

  private def scan(s: UTF8String, keep: Int => Boolean,
                   drop: UTF8String => Boolean): ArrayData = {
    // UTF8String.toLowerCase matches lower(col) exactly
    val str = s.toLowerCase.toString
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    var start = -1
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      val w = Character.charCount(cp)
      if (keep(cp)) { if (start < 0) start = i }
      else if (start >= 0) {
        val tok = UTF8String.fromString(str.substring(start, i))
        if (!drop(tok)) { out.add(tok); () }
        start = -1
      }
      i += w
    }
    if (start >= 0) {
      val tok = UTF8String.fromString(str.substring(start))
      if (!drop(tok)) { out.add(tok); () }
    }
    new GenericArrayData(out.toArray)
  }

  private val noDrop: UTF8String => Boolean = _ => false

  private val uriStop: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    graft.analyzers.Analyzers.UriStopwords.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  /** standard-analyzer tokens: lowercase, split on non-(letter|number). */
  def standard(s: UTF8String): ArrayData = scan(s, isLetterOrNumber, noDrop)

  /** uri_analyzer tokens: lowercase, split on non-letter, drop
    * {http, https, ftp, www, com}.
    */
  def uri(s: UTF8String): ArrayData = scan(s, isLetter, uriStop.contains)

  private val ngramSep = UTF8String.fromString(" ")

  /** Word n-grams of a token array in positional order, optionally
    * first-occurrence-distinct — the single-pass backing of
    * [[NgramsExpr]]. Semantics are bit-identical to the HOF reference
    * (`zip_with`-reduced shifted slices joined by `concat_ws(" ", …)`,
    * then `array_distinct` when distinct): concat_ws skips null elements,
    * and distinct keeps the FIRST occurrence, exactly like array_distinct.
    */
  def ngrams(toks: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[UTF8String](m - n + 1)
    val seen = if (distinct) new java.util.HashSet[UTF8String]() else null
    var i = 0
    while (i <= m - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      val s = UTF8String.concatWs(ngramSep, parts: _*)
      if (seen == null || seen.add(s)) { out.add(s); () }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

abstract class TokenizeBase extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  /** The static Tok method backing this expression. */
  protected def fn: String

  override protected def nullSafeEval(input: Any): Any =
    if (fn == "standard") Tok.standard(input.asInstanceOf[UTF8String])
    else Tok.uri(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Tok.$fn($c)")
}

/** `graft_tokenize(str)` — standard-analyzer tokens. */
case class StandardTokensExpr(child: Expression) extends TokenizeBase {
  override protected def fn: String = "standard"
  override def prettyName: String = "graft_tokenize"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_uri_tokenize(str)` — uri_analyzer tokens. */
case class UriTokensExpr(child: Expression) extends TokenizeBase {
  override protected def fn: String = "uri"
  override def prettyName: String = "graft_uri_tokenize"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_weight_sum(tokens)` — Σ weight(token) over a token array against
  * a DRIVER-SUPPLIED weight table: the classifier-scoring kernel
  * (TextAnalysis.scoreWithWeightMap). The Column-pipeline equivalent —
  * `aggregate(tokens, 0L, (acc, x) -> acc + element_at(mapLit, x))` —
  * evaluates interpreted (higher-order functions have no codegen) AND pays
  * a LINEAR scan of the literal map per lookup (a map literal is
  * ArrayBasedMapData — no hash), which the century probe measured as
  * 133× wall at 100× rows. This kernel hashes the table ONCE per executor
  * (transient lazy, rebuilt after deserialization) and folds each row in
  * one JVM loop — O(tokens) per row with O(1) lookups, inside whole-stage
  * codegen via a reference-object call. Missing tokens contribute 0; the
  * sum is exact long arithmetic, order-free.
  */
case class WeightSumExpr(child: Expression, weights: Map[String, Long])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<STRING>, got ${t.sql}")
    }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_weight_sum"

  @transient private lazy val table: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](
      math.max(8, weights.size * 2))
    weights.foreach { case (k, v) =>
      m.put(UTF8String.fromString(k), java.lang.Long.valueOf(v)); ()
    }
    m
  }

  def sum(tokens: ArrayData): Long = {
    var acc = 0L
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      val w = table.get(tokens.getUTF8String(i))
      if (w ne null) acc += w.longValue()
      i += 1
    }
    acc
  }

  override protected def nullSafeEval(a: Any): Any = sum(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("weightSum", this, classOf[WeightSumExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.sum($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_quality_micros(tokens)` — the quality blend's exact 6-decimal
  * MICROS integer (TextAnalysis.qualityMicrosCol's contract) in ONE native
  * pass: token count, stopword membership (hash set), distinct count (hash
  * set) and the integer HALF_UP division together in a single JVM loop.
  * The Column-pipeline twin pays an interpreted `filter` HOF whose
  * `isInCollection` is a LINEAR scan of the stopword list per token, plus
  * an `array_distinct` walk — the same cost class the weight-sum kernel
  * replaced. Values are bit-identical to the Column form (same rational,
  * same floor — parity spec-pinned); the all-long division here is exact
  * to ~1.8×10¹⁰ tokens/doc vs the Column form's 1.8×10⁷ double guard.
  */
case class QualityMicrosExpr(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<STRING>, got ${t.sql}")
    }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_quality_micros"

  @transient private lazy val stopSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](math.max(8, stopwords.size * 2))
    stopwords.foreach { w => s.add(UTF8String.fromString(w)); () }
    s
  }

  def micros(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    if (n == 0) return 0L
    val seen = new java.util.HashSet[UTF8String](n * 2)
    var nStop = 0L
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (stopSet.contains(t)) nStop += 1
      seen.add(t)
      i += 1
    }
    val nTok = n.toLong
    val num = 2L * math.min(nTok, 100L) * nTok + 150L * (nStop + seen.size.toLong)
    val den = 500L * nTok
    (1000000L * num + (den >> 1)) / den
  }

  override protected def nullSafeEval(a: Any): Any = micros(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("qualityMicros", this, classOf[QualityMicrosExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.micros($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_phrase_count(tokens)` — exact slop-0 phrase occurrence count in
  * ONE native loop: the number of start offsets where the token array
  * carries `terms` adjacent and in order. L = 1 degenerates to a plain
  * term-frequency count, which is what the BM25 scorer needs per query
  * term. The Column-pipeline twin (`size(filter(sequence(...), i ->
  * conjunction))`) is an interpreted HOF allocating an index array per
  * row — the cost class the weight-sum/quality kernels replaced on the
  * century probe; values are identical (parity spec-pinned). Query terms
  * are bounded by the query, so the reference array is executor-resident
  * once, like the weight table.
  */
case class PhraseCountExpr(child: Expression, terms: Seq[String])
    extends UnaryExpression {
  require(terms.nonEmpty, "graft_phrase_count needs at least one term")
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<STRING>, got ${t.sql}")
    }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_phrase_count"

  @transient private lazy val t: Array[UTF8String] =
    terms.map(UTF8String.fromString).toArray

  def count(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val l = t.length
    if (n < l) return 0L
    var acc = 0L
    var i = 0
    while (i <= n - l) {
      var j = 0
      while (j < l && t(j).equals(tokens.getUTF8String(i + j))) j += 1
      if (j == l) acc += 1
      i += 1
    }
    acc
  }

  override protected def nullSafeEval(a: Any): Any = count(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("phraseCount", this, classOf[PhraseCountExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.count($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_ngrams(tokens)` — word n-grams of a token array in one native
  * pass, optionally first-occurrence-distinct (r17 optimization kernel).
  *
  * The Column-pipeline equivalent — n shifted `slice`s zip_with-reduced
  * with `concat_ws` (TextAnalysis.ngrams' former body) — evaluates
  * interpreted (HOFs have no codegen) and, worse, re-evaluates its CHILD
  * per slice: callers had to materialize the token array behind an explicit
  * `repartition` shuffle barrier just to stop CollapseProject from inlining
  * the tokenizer n times (see Dedup.withShingles' r16 comment). A native
  * UnaryExpression evaluates its child exactly once per row, so that
  * barrier exchange disappears from every shingle pipeline, and the n-gram
  * assembly itself is one allocation-light loop inside whole-stage codegen.
  * Equivalence with the HOF reference is spec-asserted (TokenizeSpec).
  */
case class NgramsExpr(child: Expression, n: Int, distinct: Boolean)
  extends UnaryExpression {
  require(n >= 1, s"ngram width must be >= 1, got $n")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_ngrams"
  override protected def nullSafeEval(input: Any): Any =
    Tok.ngrams(input.asInstanceOf[ArrayData], n, distinct)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Tok.ngrams($c, $n, $distinct)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Tokenize {
  /** Column forms, usable anywhere a built-in is. */
  def standardTokens(c: Column): Column =
    GraftBridge.column(StandardTokensExpr(GraftBridge.expression(c)))
  def uriTokens(c: Column): Column =
    GraftBridge.column(UriTokensExpr(GraftBridge.expression(c)))
  def weightSum(tokens: Column, weights: Map[String, Long]): Column =
    GraftBridge.column(WeightSumExpr(GraftBridge.expression(tokens), weights))
  def qualityMicros(tokens: Column, stopwords: Seq[String]): Column =
    GraftBridge.column(QualityMicrosExpr(GraftBridge.expression(tokens), stopwords))
  def phraseCount(tokens: Column, terms: Seq[String]): Column =
    GraftBridge.column(PhraseCountExpr(GraftBridge.expression(tokens), terms))
  def ngrams(tokens: Column, n: Int, distinct: Boolean = false): Column =
    GraftBridge.column(NgramsExpr(GraftBridge.expression(tokens), n, distinct))
}
