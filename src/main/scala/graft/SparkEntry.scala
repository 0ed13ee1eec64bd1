package graft

import graft.compile.QueryCompiler
import graft.exec.SearchExecutor
import graft.model.{AclContext, DataSetFiltering, InvalidQueryException}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — one `queries` entry (+ oracle SQL) per implemented
  * operator from SURVEY.md §2. All catalog operators run over the
  * deterministic metadata corpus derived from the driver's `part` table
  * ([[Corpus]]); the oracle SQL prefixes [[Corpus.metaSql]] so DuckDB
  * computes the identical corpus.
  */
object SparkEntry {

  private val admin = AclContext(Nil, isAdmin = true)
  private val M = Corpus.metaSql

  /** DuckDB equivalent of Analyzers.standardTokens (ASCII corpus). */
  private def stdToks(c: String): String =
    s"list_filter(string_split_regex(lower($c), '[^a-z0-9]+'), x -> x <> '')"

  /** DuckDB equivalent of Analyzers.uriTokens. */
  private def uriToks(c: String): String =
    s"list_filter(string_split_regex(lower($c), '[^a-z]+'), x -> x <> '' AND x NOT IN ('http','https','ftp','www','com'))"

  /** Compile DSL + ACL, run the two-branch executor, return the hits branch
    * (ordered by score desc, id — deterministic).
    */
  private def hits(spark: SparkSession, sfDir: String, dsl: String, acl: AclContext): DataFrame = {
    val cq = QueryCompiler.compile(QueryCompiler.parse(dsl), acl)
    SearchExecutor.hitsBranch(SearchExecutor.baseBranch(Corpus.metadata(spark, sfDir), cq), cq)
  }

  /** Unpaged variant: splice a huge size into the DSL so the hits branch
    * returns every matching row, still deterministically ordered.
    */
  private def all(dsl: String): String = {
    val inner = dsl.trim.stripPrefix("{").stripSuffix("}").trim
    if (inner.isEmpty) """{"size":10000000}"""
    else s"""{"size":10000000,$inner}"""
  }

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    hits(spark, "/root/testdata/sf0.001", """{"query":"red","size":100}""", admin)

  // ------------------------------------------------------------------------
  // queries + oracleSql: keys must match; output column names must match the
  // oracle's aliases exactly (driver sorts columns by name before hashing).
  // ------------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // F1 equality filter (single-value term)
    "f1_equality" -> ((s, d) =>
      hits(s, d, all("""{"filters":[{"category":["cat3"]}]}"""), admin)
        .select(col("id"), col("category"))),

    // F2 set-membership filter (terms)
    "f2_set_membership" -> ((s, d) =>
      hits(s, d, all("""{"filters":[{"format":["csv","avro"]}]}"""), admin)
        .select(col("id"), col("format"))),

    // F3 closed time range (inclusive both ends)
    "f3_time_range" -> ((s, d) =>
      hits(s, d, all("""{"filters":[{"creationTime":["2015-03-01 00:00:00","2015-06-01 00:00:00"]}]}"""), admin)
        .select(col("id"), date_format(col("creationTime"), "yyyy-MM-dd").as("creation_date"))),

    // F3 open range: -1 elides the lower bound
    "f3_open_range" -> ((s, d) =>
      hits(s, d, all("""{"filters":[{"creationTime":["-1","2015-02-01 00:00:00"]}]}"""), admin)
        .select(col("id"), date_format(col("creationTime"), "yyyy-MM-dd").as("creation_date"))),

    // F4 conjunction of three filters
    "f4_conjunction" -> ((s, d) =>
      hits(s, d, all("""{"filters":[{"category":["cat2"]},{"isPublic":[true]},{"format":["csv","avro"]}]}"""), admin)
        .select(col("id"), col("category"), col("format"), col("isPublic").as("is_public"))),

    // F5 ACL OR-group, default mode: (orgUUID ∈ orgs) OR isPublic
    "f5_acl_default" -> ((s, d) =>
      hits(s, d, all("{}"), AclContext(Seq("org1"), isAdmin = false))
        .select(col("id"), col("orgUUID").as("org_uuid"), col("isPublic").as("is_public"))),

    // F5 onlyPrivate mode: orgUUID ∈ orgs AND NOT isPublic
    "f5_only_private" -> ((s, d) =>
      hits(s, d, all("{}"),
        AclContext(Seq("org1", "org2"), isAdmin = false, DataSetFiltering.OnlyPrivate))
        .select(col("id"), col("orgUUID").as("org_uuid"), col("isPublic").as("is_public"))),

    // F5 onlyPublic mode: isPublic only
    "f5_only_public" -> ((s, d) =>
      hits(s, d, all("{}"),
        AclContext(Seq("org1"), isAdmin = false, DataSetFiltering.OnlyPublic))
        .select(col("id"), col("isPublic").as("is_public"))),

    // F6 whitelist: illegal filter field → InvalidQuery (the reference's 400)
    "f6_whitelist_reject" -> ((s, d) => {
      import s.implicits._
      val err =
        try { hits(s, d, """{"filters":[{"badField":["x"]}]}""", admin); "NO_ERROR" }
        catch { case _: InvalidQueryException => "InvalidQuery" }
      Seq(err).toDF("error")
    }),

    // X1 DSL parser: malformed JSON → InvalidQuery
    "x1_dsl_error" -> ((s, d) => {
      import s.implicits._
      val err =
        try { QueryCompiler.parse("{not json"); "NO_ERROR" }
        catch { case _: InvalidQueryException => "InvalidQuery" }
      Seq(err).toDF("error")
    }),

    // Q1 scored text query, single term hitting title(3) + dataSample(2)
    "q1_text_score" -> ((s, d) =>
      hits(s, d, all("""{"query":"red"}"""), admin)
        .select(col("id"), col(SearchExecutor.ScoreCol).as("score"))),

    // Q1 uri clause: term only reachable through the uri_analyzer tokens
    "q1_uri_clause" -> ((s, d) =>
      hits(s, d, all("""{"query":"economy"}"""), admin)
        .select(col("id"), col(SearchExecutor.ScoreCol).as("score"))),

    // Q1 multi-term: coordination fraction on dataSample/sourceUri
    "q1_multiterm" -> ((s, d) =>
      hits(s, d, all("""{"query":"red widget"}"""), admin)
        .select(col("id"), col(SearchExecutor.ScoreCol).as("score"))),

    // Q2+Q3 ranking + explicit pagination (from=5, size=10)
    "q2_pagination" -> ((s, d) =>
      hits(s, d, """{"query":"red","from":5,"size":10}""", admin)
        .select(col("id"), col(SearchExecutor.ScoreCol).as("score"))),

    // Q3 default page size (ES default 10, from 0)
    "q3_default_page" -> ((s, d) =>
      hits(s, d, """{"query":"red"}""", admin)
        .select(col("id"), col(SearchExecutor.ScoreCol).as("score"))),

    // A1 category facet: top-100 buckets by count
    "a1_facet_categories" -> ((s, d) => {
      val cq = QueryCompiler.compile(QueryCompiler.parse("{}"), admin)
      SearchExecutor.facetBranch(
        SearchExecutor.baseBranch(Corpus.metadata(s, d), cq), "category", SearchExecutor.CategoryFacetSize)
        .select(col("category"), col("count").as("cnt"))
    }),

    // A2 format facet: top-10 buckets
    "a2_facet_formats" -> ((s, d) => {
      val cq = QueryCompiler.compile(QueryCompiler.parse("{}"), admin)
      SearchExecutor.facetBranch(
        SearchExecutor.baseBranch(Corpus.metadata(s, d), cq), "format", SearchExecutor.FormatFacetSize)
        .select(col("format"), col("count").as("cnt"))
    }),

    // A3 post-filter segregation: the format filter restricts hits but NOT
    // this facet; ACL does restrict it
    "a3_facet_segregation" -> ((s, d) => {
      val cq = QueryCompiler.compile(
        QueryCompiler.parse("""{"filters":[{"format":["csv"]}]}"""),
        AclContext(Seq("org1"), isAdmin = false))
      SearchExecutor.facetBranch(
        SearchExecutor.baseBranch(Corpus.metadata(s, d), cq), "category", SearchExecutor.CategoryFacetSize)
        .select(col("category"), col("count").as("cnt"))
    }),

    // A4 total = count of the POST-filtered set (ES hits.total semantics)
    "a4_total_count" -> ((s, d) => {
      import s.implicits._
      val cq = QueryCompiler.compile(
        QueryCompiler.parse("""{"filters":[{"format":["csv"]}]}"""),
        AclContext(Seq("org1"), isAdmin = false))
      val base = SearchExecutor.baseBranch(Corpus.metadata(s, d), cq)
      Seq(base.where(cq.postFilter).count()).toDF("total")
    }),

    // R1 result shaping: full entry columns on a paged, filtered, scored search
    "r1_result_shape" -> ((s, d) =>
      hits(s, d, """{"query":"red","filters":[{"format":["json"]}],"size":5}""",
        AclContext(Seq("org1"), isAdmin = false))
        .select(col("id"), col("category"),
          date_format(col("creationTime"), "yyyy-MM-dd").as("creation_date"),
          col("dataSample").as("data_sample"), col("format"),
          col("isPublic").as("is_public"), col("orgUUID").as("org_uuid"),
          col("recordCount").as("record_count"), col("size"),
          col("sourceUri").as("source_uri"), col("targetUri").as("target_uri"),
          col("title")))
  )

  def oracleSql: Map[String, String] = {
    val aclOr = "(orgUUID = 'org1' OR isPublic)"
    def score1(q: String): String =
      s"""(CASE WHEN contains(lower(title), '$q') THEN 3.0 ELSE 0.0 END
         | + CASE WHEN list_contains(${stdToks("dataSample")}, '$q') THEN 2.0 ELSE 0.0 END
         | + CASE WHEN list_contains(${uriToks("sourceUri")}, '$q') THEN 1.0 ELSE 0.0 END)""".stripMargin.replaceAll("\n", " ")
    val scoreRW =
      s"""(CASE WHEN contains(lower(title), 'red widget') THEN 3.0 ELSE 0.0 END
         | + (list_contains(${stdToks("dataSample")}, 'red')::INT + list_contains(${stdToks("dataSample")}, 'widget')::INT) / 2.0 * 2.0
         | + (list_contains(${uriToks("sourceUri")}, 'red')::INT + list_contains(${uriToks("sourceUri")}, 'widget')::INT) / 2.0 * 1.0)""".stripMargin.replaceAll("\n", " ")

    Map(
      "f1_equality" ->
        (M + "SELECT id, category FROM meta WHERE category = 'cat3' ORDER BY id"),
      "f2_set_membership" ->
        (M + "SELECT id, format FROM meta WHERE format IN ('csv','avro') ORDER BY id"),
      "f3_time_range" ->
        (M + "SELECT id, strftime(creationTime, '%Y-%m-%d') AS creation_date FROM meta " +
          "WHERE creationTime BETWEEN TIMESTAMP '2015-03-01 00:00:00' AND TIMESTAMP '2015-06-01 00:00:00' ORDER BY id"),
      "f3_open_range" ->
        (M + "SELECT id, strftime(creationTime, '%Y-%m-%d') AS creation_date FROM meta " +
          "WHERE creationTime <= TIMESTAMP '2015-02-01 00:00:00' ORDER BY id"),
      "f4_conjunction" ->
        (M + "SELECT id, category, format, isPublic AS is_public FROM meta " +
          "WHERE category = 'cat2' AND isPublic AND format IN ('csv','avro') ORDER BY id"),
      "f5_acl_default" ->
        (M + s"SELECT id, orgUUID AS org_uuid, isPublic AS is_public FROM meta WHERE $aclOr ORDER BY id"),
      "f5_only_private" ->
        (M + "SELECT id, orgUUID AS org_uuid, isPublic AS is_public FROM meta " +
          "WHERE orgUUID IN ('org1','org2') AND NOT isPublic ORDER BY id"),
      "f5_only_public" ->
        (M + "SELECT id, isPublic AS is_public FROM meta WHERE isPublic ORDER BY id"),
      "f6_whitelist_reject" -> "SELECT 'InvalidQuery' AS error",
      "x1_dsl_error" -> "SELECT 'InvalidQuery' AS error",
      "q1_text_score" ->
        (M + s"SELECT id, score FROM (SELECT id, ${score1("red")} AS score FROM meta) WHERE score > 0 ORDER BY score DESC, id"),
      "q1_uri_clause" ->
        (M + s"SELECT id, score FROM (SELECT id, ${score1("economy")} AS score FROM meta) WHERE score > 0 ORDER BY score DESC, id"),
      "q1_multiterm" ->
        (M + s"SELECT id, score FROM (SELECT id, $scoreRW AS score FROM meta) WHERE score > 0 ORDER BY score DESC, id"),
      "q2_pagination" ->
        (M + s"SELECT id, score FROM (SELECT id, ${score1("red")} AS score FROM meta) WHERE score > 0 ORDER BY score DESC, id LIMIT 10 OFFSET 5"),
      "q3_default_page" ->
        (M + s"SELECT id, score FROM (SELECT id, ${score1("red")} AS score FROM meta) WHERE score > 0 ORDER BY score DESC, id LIMIT 10 OFFSET 0"),
      "a1_facet_categories" ->
        (M + "SELECT category, count(*) AS cnt FROM meta GROUP BY category ORDER BY cnt DESC, category LIMIT 100"),
      "a2_facet_formats" ->
        (M + "SELECT format, count(*) AS cnt FROM meta GROUP BY format ORDER BY cnt DESC, format LIMIT 10"),
      "a3_facet_segregation" ->
        (M + s"SELECT category, count(*) AS cnt FROM meta WHERE $aclOr GROUP BY category ORDER BY cnt DESC, category LIMIT 100"),
      "a4_total_count" ->
        (M + s"SELECT count(*) AS total FROM meta WHERE $aclOr AND format = 'csv'"),
      "r1_result_shape" ->
        (M + s"""SELECT id, category, creation_date, data_sample, format, is_public, org_uuid,
                | record_count, "size", source_uri, target_uri, title FROM (
                |   SELECT id, category, strftime(creationTime, '%Y-%m-%d') AS creation_date,
                |     dataSample AS data_sample, format, isPublic AS is_public, orgUUID AS org_uuid,
                |     recordCount AS record_count, "size", sourceUri AS source_uri,
                |     targetUri AS target_uri, title, ${score1("red")} AS score
                |   FROM meta WHERE $aclOr AND format = 'json')
                | WHERE score > 0 ORDER BY score DESC, id LIMIT 5 OFFSET 0""".stripMargin.replaceAll("\n", " "))
    )
  }
}
