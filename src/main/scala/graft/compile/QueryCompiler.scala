package graft.compile

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.analyzers.Analyzers
import graft.model._
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** The compiled form of one catalog search: two predicate trees (the §2.3
  * query-vs-post segregation), an optional score column, and a page.
  *
  * - `queryFilter` restricts hits AND facets (creationTime ranges, ACL, and —
  *   in non-default modes — orgUUID/isPublic user filters).
  * - `postFilter` restricts hits only (all other whitelisted fields), so facet
  *   lists stay populated with counts from the pre-post-filter result set
  *   (reference: data_catalog/query_translation.py:75-96,215-243).
  * - `score` is present iff the DSL carried text; hits with score == 0 are
  *   dropped (match-if-any-clause, reference: query_translation.py:116-160).
  */
final case class CompiledQuery(
    queryFilter: Column,
    postFilter: Column,
    score: Option[Column],
    from: Int,
    size: Int
)

/** DSL JSON → CompiledQuery. Pure plan construction: no Spark action, no
  * session. Catalyst then pushes the resulting predicates down to the scan.
  *
  * Reference pipeline being re-expressed: parse (query_translation.py:57-68),
  * base text query (:116-160), filter extraction + segregation (:168-243),
  * pagination (:98-109). The reference emits an ES query AST; we emit Catalyst
  * `Column` trees and let Catalyst optimize.
  */
object QueryCompiler {

  val DefaultFrom = 0
  /** ES default page size, applied when the client sets none
    * (reference: query_translation.py:98-109 passes from/size through verbatim
    * and lets ES default to 10).
    */
  val DefaultSize = 10

  /** Clause boosts of the scored multi-field text query
    * (reference: query_translation.py:134-155).
    */
  val TitleBoost = 3.0
  val SampleBoost = 2.0
  val UriBoost = 1.0

  private val mapper = new ObjectMapper()

  // ---------------------------------------------------------------- parsing

  /** JSON string → CatalogQuery. Empty/None → match-all; malformed JSON or an
    * illegal shape → InvalidQueryException (HTTP 400 in the reference,
    * query_translation.py:57-68 + tests/test_query_translation.py:543-550).
    */
  def parse(raw: String): CatalogQuery = {
    if (raw == null || raw.trim.isEmpty) return CatalogQuery()
    val root =
      try mapper.readTree(raw)
      catch { case e: Exception => throw new InvalidQueryException(s"malformed query JSON: ${e.getMessage}") }
    if (!root.isObject) throw new InvalidQueryException("query DSL must be a JSON object")
    val query = Option(root.get("query")).filter(!_.isNull).map(_.asText).filter(_.nonEmpty)
    val filters = Option(root.get("filters")).filter(!_.isNull).map { fnode =>
      if (!fnode.isArray) throw new InvalidQueryException("'filters' must be a list")
      fnode.elements.asScala.flatMap { f =>
        if (!f.isObject) throw new InvalidQueryException("each filter must be an object")
        f.properties.asScala.map { e =>
          val values = e.getValue
          if (!values.isArray) throw new InvalidQueryException(s"filter '${e.getKey}' values must be a list")
          e.getKey -> values.elements.asScala.map(jsonScalar).toSeq
        }
      }.toSeq
    }.getOrElse(Nil)
    val from = intField(root, "from")
    val size = intField(root, "size")
    CatalogQuery(query, filters, from, size)
  }

  private def jsonScalar(n: JsonNode): Any = n match {
    case _ if n.isTextual => n.asText
    case _ if n.isBoolean => n.asBoolean
    case _ if n.isIntegralNumber => n.asLong
    case _ if n.isFloatingPointNumber => n.asDouble
    case _ => throw new InvalidQueryException(s"unsupported filter value: $n")
  }

  private def intField(root: JsonNode, name: String): Option[Int] =
    Option(root.get(name)).filter(!_.isNull).map { n =>
      if (!n.canConvertToInt) throw new InvalidQueryException(s"'$name' must be an integer")
      n.asInt
    }

  // ------------------------------------------------------------- compiling

  def compile(q: CatalogQuery, acl: AclContext): CompiledQuery = {
    // 1. validate user filters against the whitelist (fail fast, F6).
    q.filters.foreach { case (field, _) =>
      if (!MetadataSchema.filterWhitelist.contains(field))
        throw new InvalidQueryException(s"illegal filter field: $field")
    }

    // 2. inject the ACL predicate as filters ahead of user filters, exactly as
    //    the reference appends them before segregation
    //    (reference: query_translation.py:182-191).
    val unscopedAdmin = acl.isAdmin && acl.orgUuidList.isEmpty
    val injected: Seq[(String, Seq[Any])] = acl.filtering match {
      case DataSetFiltering.Both =>
        if (unscopedAdmin) Nil // admin with no org scope sees everything
        else Seq("orgUUID" -> acl.orgUuidList.map(x => x: Any), "isPublic" -> Seq(true))
      case DataSetFiltering.OnlyPrivate =>
        (if (unscopedAdmin) Nil else Seq("orgUUID" -> acl.orgUuidList.map(x => x: Any))) ++
          Seq("isPublic" -> Seq(false))
      case DataSetFiltering.OnlyPublic =>
        Seq("isPublic" -> Seq(true))
    }
    val allFilters = injected ++ q.filters

    // 3. segregate (reference: query_translation.py:215-243):
    //    - creationTime → query filters, always
    //    - orgUUID/isPublic → OR-group in default mode, query filters otherwise
    //    - everything else → post filters
    val isDefault = acl.filtering == DataSetFiltering.Both
    val (aclish, rest) = allFilters.partition { case (f, _) => f == "orgUUID" || f == "isPublic" }
    val (timeFilters, postFilters) = rest.partition { case (f, _) => f == "creationTime" }

    val timeCols = timeFilters.map { case (_, vs) => timeRange(vs) }
    val aclCols = aclish.map { case (f, vs) => predicate(f, vs) }
    val queryCols =
      if (isDefault) timeCols ++ reduceOr(aclCols).toSeq
      else timeCols ++ aclCols
    val postCols = postFilters.map { case (f, vs) => predicate(f, vs) }

    CompiledQuery(
      queryFilter = queryCols.reduceOption(_ && _).getOrElse(lit(true)),
      postFilter = postCols.reduceOption(_ && _).getOrElse(lit(true)),
      score = q.query.map(scoreColumn),
      from = q.from.getOrElse(DefaultFrom),
      size = q.size.getOrElse(DefaultSize)
    )
  }

  private def reduceOr(cols: Seq[Column]): Option[Column] = cols.reduceOption(_ || _)

  /** One attribute filter → predicate. Typed comparison per field kind:
    *  - orgUUID is `not_analyzed` in the reference mapping → exact match on
    *    the lowercased value (the auth layer lowercases orgs,
    *    reference: auth.py:149-169; the translator lowercases all values,
    *    query_translation.py:272).
    *  - analyzed string fields: an ES `term` matches one lowercased token, so
    *    the faithful predicate is token-membership, not whole-string equality.
    *  - booleans/longs: typed equality (documented deviation from the
    *    reference's stringified terms, SURVEY.md §2.1 F1).
    * Single value → equality shape, multi value → OR/membership
    * (reference: query_translation.py:271-276).
    */
  private def predicate(field: String, values: Seq[Any]): Column = {
    if (values.isEmpty) throw new InvalidQueryException(s"filter '$field' needs at least one value")
    field match {
      case "orgUUID" =>
        val vs = values.map(_.toString.toLowerCase)
        if (vs.size == 1) col(field) === vs.head else col(field).isin(vs: _*)
      case "isPublic" =>
        val vs = values.map(toBool)
        if (vs.size == 1) col(field) === vs.head else col(field).isin(vs: _*)
      case "recordCount" | "size" =>
        val vs = values.map(toLong(field, _))
        if (vs.size == 1) col(field) === vs.head else col(field).isin(vs: _*)
      case "creationTime" => timeRange(values)
      case "title" =>
        // title is english-analyzed in the reference mapping
        // (configuration_const.py:26-29): a `term` filter matches STEMMED
        // lowercased tokens — {"title":["rates"]} matches stored token
        // `rate`. Stem both sides.
        val toks = Analyzers.stemmedTokens(col(field))
        values.map(v => array_contains(toks, Analyzers.stem(v.toString.toLowerCase)))
          .reduce(_ || _)
      case _ => // analyzed string fields: category, format, dataSample, sourceUri, targetUri
        val toks = Analyzers.standardTokens(col(field))
        values.map(v => array_contains(toks, v.toString.toLowerCase)).reduce(_ || _)
    }
  }

  private def toBool(v: Any): Boolean = v match {
    case b: Boolean => b
    case s: String => s.equalsIgnoreCase("true")
    case n: Long => n != 0L
    case other => throw new InvalidQueryException(s"not a boolean: $other")
  }

  private def toLong(field: String, v: Any): Long = v match {
    case n: Long => n
    case d: Double => d.toLong
    case s: String =>
      try s.toLong
      catch { case _: NumberFormatException => throw new InvalidQueryException(s"filter '$field': not an integer: $s") }
    case other => throw new InvalidQueryException(s"filter '$field': not an integer: $other")
  }

  /** creationTime range: exactly two values [from, to], inclusive both ends
    * (ES range default gte/lte); -1 on either side = unbounded
    * (reference: query_translation.py:278-291).
    */
  private def timeRange(values: Seq[Any]): Column = {
    if (values.size != 2)
      throw new InvalidQueryException(s"creationTime filter takes exactly 2 values, got ${values.size}")
    val Seq(fromV, toV) = values
    def unbounded(v: Any): Boolean = v match {
      case n: Long => n == -1L
      case d: Double => d == -1.0
      case s: String => s == "-1"
      case _ => false
    }
    val c = col("creationTime")
    val lo = if (unbounded(fromV)) None else Some(c >= to_timestamp(lit(fromV.toString)))
    val hi = if (unbounded(toV)) None else Some(c <= to_timestamp(lit(toV.toString)))
    (lo.toSeq ++ hi.toSeq).reduceOption(_ && _).getOrElse(lit(true))
  }

  /** Scored multi-field text query, Q1 (reference:
    * query_translation.py:116-160): OR-of-three, clause boosts 3/2/1, doc
    * matches if ANY clause matches.
    *
    *  - title, boost 3: the reference compiles `wildcard *q*` over analyzed
    *    title terms — constant-score in ES. Parity: whole-lowercased-title
    *    contains (documented superset for multi-word queries, SURVEY.md §2.2).
    *  - dataSample, boost 2: analyzed `match` = OR-of-terms. Scored here as
    *    the matched fraction of query terms (ES 2.x coordination factor);
    *    exact TF-IDF values are not part of the reference contract — only
    *    ordering, which stays monotone in clause weight.
    *  - sourceUri, boost 1: both sides analyzed with the uri_analyzer.
    *
    * Everything below is built from codegen'd built-ins (split/filter/
    * array_intersect/size) — no UDF, stays inside WholeStageCodegen.
    */
  def scoreColumn(rawQuery: String): Column = {
    val qLower = rawQuery.toLowerCase
    val qStd = Analyzers.standardTokensScala(rawQuery).distinct
    val qUri = Analyzers.uriTokensScala(rawQuery).distinct

    val titleHit = when(lower(col("title")).contains(qLower), TitleBoost).otherwise(0.0)
    val sample =
      if (qStd.isEmpty) lit(0.0)
      else size(array_intersect(Analyzers.standardTokens(col("dataSample")), lit(qStd.toArray)))
        .cast("double") / qStd.size * SampleBoost
    val uri =
      if (qUri.isEmpty) lit(0.0)
      else size(array_intersect(Analyzers.uriTokens(col("sourceUri")), lit(qUri.toArray)))
        .cast("double") / qUri.size * UriBoost
    titleHit + sample + uri
  }

  // -------------------------------------------------- M6: IDF-weighted score

  /** Corpus doc-frequency snapshot for the query terms: one aggregate pass
    * over the corpus (count + one conditional sum per term). The returned
    * map is the broadcast-able statistic ES keeps per segment
    * (SURVEY.md §4.2); at catalog scale it rides into the score expression
    * as literals, on a 100 TB corpus the same map is a tiny broadcast.
    */
  def idfWeights(corpus: DataFrame, terms: Seq[String],
                 field: String = "dataSample"): (Long, Map[String, Long]) = {
    val toks = Analyzers.standardTokens(col(field))
    val aggs = count(lit(1)) +: terms.map(t =>
      sum(when(array_contains(toks, t), 1L).otherwise(0L)))
    val row = corpus.agg(aggs.head, aggs.tail: _*).collect().head
    (row.getLong(0), terms.zipWithIndex.map { case (t, i) => t -> row.getLong(i + 1) }.toMap)
  }

  /** [[idfWeights]] in MAINTAINABLE long form: one row per requested term,
    * `(term, df, n_docs)` — including df-0 terms, so the table's key set is
    * stable under maintenance. The long shape exists so the store's change
    * feed can advance it ([[maintainIdfStats]]) instead of re-scanning the
    * corpus.
    *
    * ONE explode/aggregate pass (the t11 shape), not one plan branch per
    * term: each doc emits its distinct matched terms (`array_intersect`
    * dedupes) plus a sentinel row that carries the doc count through the
    * SAME aggregate, so `n_docs` costs no second scan. The grouped counts
    * are |terms|+1 rows — collected as the broadcast-able statistic this
    * table IS (the [[idfWeights]] contract), then re-emitted with df-0
    * terms filled in. A 32k-term vocabulary is one corpus scan and a
    * |terms|-bounded map-side-combined shuffle, where the per-term-branch
    * form leaned on runtime exchange reuse to avoid |terms| corpus scans.
    */
  def idfStatsTable(corpus: DataFrame, terms: Seq[String],
                    field: String = "dataSample"): DataFrame = {
    val spark = corpus.sparkSession
    // standard tokens are lowercase alphanumerics, so a NUL-prefixed name
    // can never collide with a real term
    val sentinel = "\u0000n_docs"
    val matched = array_intersect(
      Analyzers.standardTokens(col(field)), lit(terms.distinct.toArray))
    val counts = corpus
      // a null/tokenless field still counts toward n_docs: the sentinel
      // rides every row, the matched slice contributes nothing
      .select(explode(concat(array(lit(sentinel)),
        coalesce(matched, array().cast("array<string>")))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts.getOrElse(sentinel, 0L)
    val rows = terms.map(t => Row(t, counts.getOrElse(t, 0L), n))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("term", org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("df", org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_docs", org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** Incremental IDF maintenance — the one derived statistic the store's
    * CDC discipline ([[graft.store.MetadataStore.maintainCategoryStats]],
    * the s12 shape) now also covers: advance a `(term, df, n_docs)` table
    * by the change feed alone, cost ∝ |changes|, never a corpus re-scan —
    * the way ES re-computes IDF continuously as documents index
    * (reference: configuration_const.py:26-38, the analyzed-fields list
    * whose stats ES keeps per segment).
    *
    * Fold rule per term: every changed id RETRACTS its pre-image's
    * membership (update or delete alike — latest-wins netting means each
    * id appears once in the window) and every upsert ADDS its new row's
    * membership; `n_docs` moves by (upserts − pre-images). Pre-images are
    * fetched from the old snapshot by pushed id-set point lookup — the
    * changed-id set is bounded by the feed window, and the resulting scan
    * prunes to those row groups. The maintained table hash-matches a
    * fresh [[idfStatsTable]] over the post-change corpus (spec-pinned and
    * oracle-gated); at 100 TB the recompute reads everything, this reads
    * |changes| rows.
    */
  /** Per-batch IDF DELTA for APPEND-ONLY ingest: one row per requested
    * term, `(term, d_df, d_n)` — the batch's term-membership counts and
    * row count. Appends retract nothing, so a batch's delta is a pure
    * function of the batch alone: deltas from different batches fold in
    * ANY order ([[idfStatsWithDeltas]]), which is what lets a stream land
    * them merge-on-read (the e14 log-of-partials algebra applied to an
    * EXACT statistic — exact, so replay safety comes from per-batch-id
    * overwrite, not from union idempotence). Updates and deletes need
    * pre-image retraction and go through [[maintainIdfStats]].
    */
  def idfDeltas(batch: DataFrame, terms: Seq[String],
                field: String = "dataSample"): DataFrame =
    idfStatsTable(batch, terms, field)
      .select(col("term"), col("df").as("d_df"), col("n_docs").as("d_n"))

  /** Fold a delta log into a base stats table: per-term membership sums
    * plus ONE row-count contribution per batch (`d_n` rides every term
    * row of its batch, so the batch axis — the delta log's partition
    * column — dedupes it). Both fold inputs are metadata-scale
    * broadcasts.
    */
  def idfStatsWithDeltas(stats0: DataFrame, deltas: DataFrame,
                         batchCol: String = "batch"): DataFrame = {
    val dDf = deltas.groupBy("term").agg(sum("d_df").as("d_df"))
    val dN = deltas.select(col(batchCol), col("d_n")).distinct()
      .agg(sum("d_n").as("d_n"))
    stats0.join(broadcast(dDf), Seq("term"), "left")
      .crossJoin(broadcast(dN))
      .select(col("term"),
        (col("df") + coalesce(col("d_df"), lit(0L))).as("df"),
        (col("n_docs") + coalesce(col("d_n"), lit(0L))).as("n_docs"))
  }

  def maintainIdfStats(statsOld: DataFrame, snapshotOld: DataFrame,
                       changes: DataFrame, terms: Seq[String],
                       field: String = "dataSample"): DataFrame = {
    // The changed-id window stays a DATAFRAME consumed through a broadcast
    // semi join (never collected into an isin literal): the feed batch is
    // CDC-scale today, but a backfill or catch-up window grows with the
    // corpus, and a 10⁵⁺-id literal list stops pushing to scans and bloats
    // the plan — where the broadcast probe stays a map-side filter and
    // supplies dynamic/runtime pruning of a partitioned snapshot layout.
    val changedIds = broadcast(changes.select(col("id")).distinct())
    val termLits = lit(terms.toArray)
    def membership(df: DataFrame, sign: Int) = df
      .select(explode(array_intersect(
        Analyzers.standardTokens(col(field)), termLits)).as("term"))
      .groupBy("term").agg((count(lit(1)) * sign).as("d_df"))
    def rows(df: DataFrame, sign: Int) =
      df.agg((count(lit(1)) * sign).as("d_n"))
    val preImages = snapshotOld.join(changedIds, Seq("id"), "left_semi")
    val upserts = changes.where(col("change_op") === "upsert")
    val dDf = membership(preImages, -1).unionByName(membership(upserts, 1))
      .groupBy("term").agg(sum("d_df").as("d_df"))
    val dN = rows(preImages, -1).unionByName(rows(upserts, 1))
      .agg(sum("d_n").as("d_n"))
    statsOld
      .join(broadcast(dDf), Seq("term"), "left")
      .crossJoin(broadcast(dN))
      .select(col("term"),
        (col("df") + coalesce(col("d_df"), lit(0L))).as("df"),
        (col("n_docs") + col("d_n")).as("n_docs"))
  }

  /** Q1 scoring with IDF-weighted dataSample matching (M6): rare query terms
    * count more. sampleScore = Σ match(t)·idf(t) / Σ idf(t) · boost with
    * idf(t) = ln(1 + N/(1+df(t))) — the add-one-smoothed IDF. Title/uri
    * clauses keep their Q1 shape; ordering stays monotone in clause weight
    * and is deterministic (the stats are a fixed snapshot, not
    * per-partition).
    */
  def scoreColumnIdf(rawQuery: String, nDocs: Long, dfs: Map[String, Long]): Column = {
    val qLower = rawQuery.toLowerCase
    val qStd = Analyzers.standardTokensScala(rawQuery).distinct
    val qUri = Analyzers.uriTokensScala(rawQuery).distinct
    val titleHit = when(lower(col("title")).contains(qLower), TitleBoost).otherwise(0.0)
    val sample =
      if (qStd.isEmpty) lit(0.0)
      else {
        val idf = qStd.map(t =>
          t -> math.log(1.0 + nDocs.toDouble / (1.0 + dfs.getOrElse(t, 0L).toDouble)))
        val sumIdf = idf.map(_._2).sum
        val toks = Analyzers.standardTokens(col("dataSample"))
        idf.map { case (t, w) => when(array_contains(toks, t), w).otherwise(0.0) }
          .reduce(_ + _) / sumIdf * SampleBoost
      }
    val uri =
      if (qUri.isEmpty) lit(0.0)
      else size(array_intersect(Analyzers.uriTokens(col("sourceUri")), lit(qUri.toArray)))
        .cast("double") / qUri.size * UriBoost
    titleHit + sample + uri
  }

  // --------------------------------------------------- M6b: TF·IDF score

  /** Q5: full TF·IDF dataSample scoring — [[scoreColumnIdf]]'s IDF weighting
    * with SUBLINEAR term frequency: a document matching a query term k times
    * contributes ln(1+k)·idf(t) instead of the boolean idf(t), so
    * repeated-term documents order first — the last piece of ES 2.1
    * default-similarity ordering fidelity (ES scores `match` clauses with
    * TF·IDF, reference: query_translation.py:141-148; Lucene's
    * ClassicSimilarity uses sqrt(tf) — ln(1+k) keeps the same sublinear
    * monotone ordering on a grid both engines compute bit-stably).
    *
    * sampleScore = Σ_t ln(1+tf_t)·idf(t) / Σ_t idf(t) · SampleBoost, with
    * tf_t the count of t in the analyzed dataSample tokens (a codegen'd
    * `filter` HOF over the same token array — no second tokenize, no UDF).
    * Title/uri clauses keep their Q1 shape; the IDF snapshot rides in as
    * literals exactly as in [[scoreColumnIdf]], so the plan stays a narrow
    * projection over the scan.
    */
  def scoreColumnTfIdf(rawQuery: String, nDocs: Long, dfs: Map[String, Long]): Column = {
    val qLower = rawQuery.toLowerCase
    val qStd = Analyzers.standardTokensScala(rawQuery).distinct
    val qUri = Analyzers.uriTokensScala(rawQuery).distinct
    val titleHit = when(lower(col("title")).contains(qLower), TitleBoost).otherwise(0.0)
    val sample =
      if (qStd.isEmpty) lit(0.0)
      else {
        val idf = qStd.map(t =>
          t -> math.log(1.0 + nDocs.toDouble / (1.0 + dfs.getOrElse(t, 0L).toDouble)))
        val sumIdf = idf.map(_._2).sum
        val toks = Analyzers.standardTokens(col("dataSample"))
        idf.map { case (t, w) =>
          log(lit(1.0) + size(filter(toks, _ === t)).cast("double")) * w
        }.reduce(_ + _) / sumIdf * SampleBoost
      }
    val uri =
      if (qUri.isEmpty) lit(0.0)
      else size(array_intersect(Analyzers.uriTokens(col("sourceUri")), lit(qUri.toArray)))
        .cast("double") / qUri.size * UriBoost
    titleHit + sample + uri
  }
}
