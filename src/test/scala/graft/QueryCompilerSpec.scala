package graft

import graft.compile.QueryCompiler
import graft.model._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class QueryCompilerSpec extends AnyFunSuite with Matchers with SparkSupport {
  import spark.implicits._

  private def ds = spark.createDataset(Fixtures.corpus)

  /** ids surviving base (query filter + score>0) ∧ post filter. */
  private def matchIds(dsl: String, acl: AclContext): Seq[String] = {
    val cq = QueryCompiler.compile(QueryCompiler.parse(dsl), acl)
    graft.exec.SearchExecutor.baseBranch(ds.toDF(), cq)
      .where(cq.postFilter).select("id").as[String].collect().toSeq.sorted
  }

  private val admin = AclContext(Nil, isAdmin = true)

  // ---- parsing --------------------------------------------------------

  test("empty / null DSL → match-all") {
    QueryCompiler.parse("") shouldBe CatalogQuery()
    QueryCompiler.parse(null) shouldBe CatalogQuery()
  }

  test("malformed JSON → InvalidQuery (reference tests/test_query_translation.py:543-550)") {
    an[InvalidQueryException] should be thrownBy QueryCompiler.parse("{not json")
    an[InvalidQueryException] should be thrownBy QueryCompiler.parse("[1,2]")
  }

  test("full DSL parses (reference tests/test_query_translation.py:552-560)") {
    val q = QueryCompiler.parse("""{"query":"blabla","filters":[{"format":["csv"]}],"size":3,"from":14}""")
    q.query shouldBe Some("blabla")
    q.filters shouldBe Seq("format" -> Seq("csv"))
    q.from shouldBe Some(14)
    q.size shouldBe Some(3)
  }

  test("bad filter shapes → InvalidQuery") {
    an[InvalidQueryException] should be thrownBy QueryCompiler.parse("""{"filters":"x"}""")
    an[InvalidQueryException] should be thrownBy QueryCompiler.parse("""{"filters":[{"format":"csv"}]}""")
    an[InvalidQueryException] should be thrownBy QueryCompiler.parse("""{"from":"x"}""")
  }

  // ---- whitelist / arity ---------------------------------------------

  test("unknown filter field rejected (F6, reference query_translation.py:258-260)") {
    an[InvalidQueryException] should be thrownBy
      QueryCompiler.compile(CatalogQuery(filters = Seq("storeType" -> Seq("hdfs"))), admin)
    an[InvalidQueryException] should be thrownBy
      QueryCompiler.compile(CatalogQuery(filters = Seq("nope" -> Seq("x"))), admin)
  }

  test("creationTime arity != 2 rejected (F3, reference query_translation.py:280-281)") {
    an[InvalidQueryException] should be thrownBy
      QueryCompiler.compile(CatalogQuery(filters = Seq("creationTime" -> Seq("2015-01-01"))), admin)
    an[InvalidQueryException] should be thrownBy
      QueryCompiler.compile(CatalogQuery(filters =
        Seq("creationTime" -> Seq("a", "b", "c"))), admin)
  }

  // ---- filters over the fixture corpus --------------------------------

  test("F1 single-value equality filter") {
    matchIds("""{"filters":[{"category":["health"]}]}""", admin) shouldBe Seq("0", "8")
  }

  test("F1 equality is case-normalized (reference lowercases values, query_translation.py:272)") {
    matchIds("""{"filters":[{"category":["HEALTH"]}]}""", admin) shouldBe Seq("0", "8")
  }

  test("F2 set membership OR within one filter") {
    matchIds("""{"filters":[{"category":["health","energy"]}]}""", admin) shouldBe Seq("0", "4", "8")
  }

  test("F3 time range inclusive both ends") {
    matchIds("""{"filters":[{"creationTime":["2015-03-01T09:30:00","2015-06-10T11:45:00"]}]}""", admin) shouldBe
      Seq("1", "2", "3", "4")
  }

  test("F3 -1 elision: unbounded from / to (reference query_translation.py:283-286)") {
    matchIds("""{"filters":[{"creationTime":[-1,"2015-03-01T09:30:00"]}]}""", admin) shouldBe Seq("0", "1")
    matchIds("""{"filters":[{"creationTime":["2015-09-15T13:00:00",-1]}]}""", admin) shouldBe Seq("7", "8", "9")
    matchIds("""{"filters":[{"creationTime":[-1,-1]}]}""", admin).size shouldBe 10
  }

  test("F4 conjunction of multiple filters") {
    matchIds("""{"filters":[{"category":["health"]},{"isPublic":[true]}]}""", admin) shouldBe Seq("0", "8")
    matchIds("""{"filters":[{"category":["finance"]},{"isPublic":[true]}]}""", admin) shouldBe Seq("9")
  }

  test("numeric filter typed equality") {
    matchIds("""{"filters":[{"recordCount":[100]}]}""", admin) shouldBe Seq("0")
    matchIds("""{"filters":[{"size":[80000,95000]}]}""", admin) shouldBe Seq("4", "7")
  }

  // ---- ACL modes (reference query_translation.py:182-191) --------------

  test("F5 default mode: (orgUUID ∈ orgs) OR isPublic") {
    // org01 rows: 0,1,6 ; public rows: 0,2,4,6,8,9
    matchIds("{}", AclContext(Seq("org01"), isAdmin = false)) shouldBe
      Seq("0", "1", "2", "4", "6", "8", "9")
  }

  test("onlyPrivate: orgUUID ∈ orgs AND NOT isPublic") {
    matchIds("{}", AclContext(Seq("org02"), isAdmin = false, DataSetFiltering.OnlyPrivate)) shouldBe
      Seq("3", "7")
  }

  test("onlyPublic: isPublic only") {
    matchIds("{}", AclContext(Seq("org02"), isAdmin = false, DataSetFiltering.OnlyPublic)) shouldBe
      Seq("0", "2", "4", "6", "8", "9")
  }

  test("unscoped admin sees everything in default mode") {
    matchIds("{}", admin).size shouldBe 10
  }

  test("unscoped admin + onlyPrivate still filters isPublic=false") {
    matchIds("{}", AclContext(Nil, isAdmin = true, DataSetFiltering.OnlyPrivate)) shouldBe
      Seq("1", "3", "5", "7")
  }

  // ---- Q1 text scoring --------------------------------------------------

  test("Q1: title contains → score includes boost 3; match-if-any-clause") {
    // "disease" appears in titles of 0 and 8; nowhere in dataSample tokens; not in URIs
    matchIds("""{"query":"disease"}""", admin) shouldBe Seq("0", "8")
  }

  test("Q1: uri clause matches via uri_analyzer (stopwords http/www/com dropped)") {
    // "bank" only in sourceUri of 9
    matchIds("""{"query":"bank"}""", admin) shouldBe Seq("9")
  }

  test("Q1: no clause matches → empty") {
    matchIds("""{"query":"zzzznothing"}""", admin) shouldBe Seq()
  }

  test("Q1 scoring monotone in clause weight: title hit outranks uri-only hit") {
    import org.apache.spark.sql.functions.col
    val cq = QueryCompiler.compile(QueryCompiler.parse("""{"query":"heart"}"""), admin)
    // id 0: title "Heart disease rates" + dataSample token "heart" + uri "heart"
    val scored = graft.exec.SearchExecutor.baseBranch(ds.toDF(), cq)
      .orderBy(col(graft.exec.SearchExecutor.ScoreCol).desc)
      .select("id").as[String].collect()
    scored.head shouldBe "0"
  }
}
