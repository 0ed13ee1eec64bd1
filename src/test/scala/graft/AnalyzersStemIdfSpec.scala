package graft

import graft.analyzers.Analyzers
import graft.compile.QueryCompiler
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class AnalyzersStemIdfSpec extends AnyFunSuite with Matchers with SparkSupport {
  import spark.implicits._

  test("stemCol agrees with the Scala stemmer across suffix classes") {
    val words = Seq("rates", "rings", "berries", "classes", "glasses", "boss",
      "running", "jumped", "red", "ss", "es", "a", "spring", "widgets",
      "cities", "watches", "used", "sing", "ring", "gas")
    val viaCol = words.toDF("w").select(Analyzers.stemCol($"w")).as[String].collect().toSeq
    viaCol shouldBe words.map(Analyzers.stem)
  }

  test("stemmed title filter matches plural query value against singular stored token") {
    val cq = QueryCompiler.compile(
      QueryCompiler.parse("""{"filters":[{"title":["rings"]}]}"""),
      graft.model.AclContext(Nil, isAdmin = true))
    val df = Seq(("1", "small ring"), ("2", "blue bolt")).toDF("id", "title")
    df.where(cq.postFilter).select("id").as[String].collect().toSeq shouldBe Seq("1")
  }

  test("IDF scoring: a rare-term match outranks a common-term match") {
    // 'rare' appears in 1 of 10 docs, 'common' in 8
    val docs = (1 to 10).map { i =>
      val sample = if (i == 1) "rare words here"
      else if (i <= 9) "common words here" else "nothing at all"
      (f"$i%03d", sample)
    }.toDF("id", "dataSample")
    val (n, dfs) = QueryCompiler.idfWeights(docs, Seq("rare", "common"))
    n shouldBe 10L
    dfs("rare") shouldBe 1L
    dfs("common") shouldBe 8L
    val scored = docs
      .withColumn("title", lit("t")).withColumn("sourceUri", lit("http://x.org/y"))
      .withColumn("score", QueryCompiler.scoreColumnIdf("rare common", n, dfs))
    val byId = scored.select($"id", $"score").as[(String, Double)].collect().toMap
    byId("001") should be > byId("002") // rare match beats common match
    byId("010") shouldBe 0.0
    // monotone in clause weight: a title hit (boost 3) dominates any sample score
    val titleDoc = Seq(("x", "nothing", "has rare common in title", "http://x.org/y"))
      .toDF("id", "dataSample", "title", "sourceUri")
      .withColumn("score", QueryCompiler.scoreColumnIdf("rare common", n, dfs))
    titleDoc.select($"score").as[Double].head() should be > byId("001")
  }

  test("IDF scores are identical across partition layouts (broadcast snapshot, not per-partition)") {
    val docs = (1 to 100).map(i => (f"$i%03d", if (i % 7 == 0) "seven up" else "plain text"))
      .toDF("id", "dataSample")
      .withColumn("title", lit("t")).withColumn("sourceUri", lit("http://x.org/y"))
    val (n, dfs) = QueryCompiler.idfWeights(docs, Seq("seven"))
    val one = docs.coalesce(1)
      .withColumn("score", QueryCompiler.scoreColumnIdf("seven", n, dfs))
      .select("id", "score").orderBy("id").as[(String, Double)].collect().toSeq
    val many = docs.repartition(13)
      .withColumn("score", QueryCompiler.scoreColumnIdf("seven", n, dfs))
      .select("id", "score").orderBy("id").as[(String, Double)].collect().toSeq
    one shouldBe many
  }

  test("TF·IDF scoring: repeated-term docs outrank single-match docs; IDF ordering preserved") {
    // 'rare' df=2, 'common' df=8; doc 001 matches rare ONCE, doc 002 matches
    // rare THREE times — q4's boolean IDF scores them equal, TF must not
    val docs = (1 to 10).map { i =>
      val sample =
        if (i == 1) "rare words here"
        else if (i == 2) "rare rare rare words"
        else if (i <= 9) "common words here" else "nothing at all"
      (f"$i%03d", sample)
    }.toDF("id", "dataSample")
      .withColumn("title", lit("t")).withColumn("sourceUri", lit("http://x.org/y"))
    val (n, dfs) = QueryCompiler.idfWeights(docs, Seq("rare", "common"))
    val tfidf = docs.withColumn("score", QueryCompiler.scoreColumnTfIdf("rare common", n, dfs))
      .select($"id", $"score").as[(String, Double)].collect().toMap
    val boolIdf = docs.withColumn("score", QueryCompiler.scoreColumnIdf("rare common", n, dfs))
      .select($"id", $"score").as[(String, Double)].collect().toMap
    boolIdf("002") shouldBe boolIdf("001") // the gap q5 exists to close
    tfidf("002") should be > tfidf("001")  // ln(1+3)·idf > ln(1+1)·idf
    tfidf("001") should be > tfidf("003")  // rare still beats common (IDF kept)
    tfidf("010") shouldBe 0.0
    // at tf == 1 everywhere the two scores agree up to the ln(2) tf factor's
    // effect — sanity: single-match doc score is ln(2)·idf-scaled, positive
    tfidf("003") should be > 0.0
  }

  test("maintainIdfStats: a full update/delete/insert cycle lands on a fresh recompute") {
    def corpus(rows: Seq[(String, String)]) =
      rows.toDF("id", "dataSample")
    val v1 = corpus(Seq(
      "001" -> "red fox",        // keeps membership
      "002" -> "plain text",     // updated INTO membership below
      "003" -> "red widget",     // deleted: retracts BOTH terms
      "004" -> "widget works"))  // untouched
    val stats1 = QueryCompiler.idfStatsTable(v1, Seq("red", "widget"))
    // the change feed's net window: 002 re-upserted with new text, 003
    // deleted (pre-image payload rides along, as changesBetween emits),
    // 005 inserted fresh
    val changes = Seq(
      ("002", "upsert", "now red here"),
      ("003", "delete", "red widget"),
      ("005", "upsert", "widget widget twice")
    ).toDF("id", "change_op", "dataSample")
    val maintained = QueryCompiler.maintainIdfStats(stats1, v1, changes, Seq("red", "widget"))
      .orderBy("term").as[(String, Long, Long)].collect().toSeq
    val v2 = corpus(Seq(
      "001" -> "red fox", "002" -> "now red here",
      "004" -> "widget works", "005" -> "widget widget twice"))
    val fresh = QueryCompiler.idfStatsTable(v2, Seq("red", "widget"))
      .orderBy("term").as[(String, Long, Long)].collect().toSeq
    maintained shouldBe fresh
    maintained shouldBe Seq(("red", 2L, 4L), ("widget", 2L, 4L))
  }

  test("idfStatsWithDeltas: append-only batch deltas fold ORDER-FREE onto a fresh recompute") {
    val base = Seq("001" -> "red fox").toDF("id", "dataSample")
    val b1 = Seq("002" -> "red widget").toDF("id", "dataSample")
    val b2 = Seq("003" -> "plain", "004" -> "widget").toDF("id", "dataSample")
    val terms = Seq("red", "widget")
    val stats0 = QueryCompiler.idfStatsTable(base, terms)
    def delta(df: org.apache.spark.sql.DataFrame, id: Int) =
      QueryCompiler.idfDeltas(df, terms).withColumn("batch", lit(id))
    val fresh = QueryCompiler
      .idfStatsTable(base.unionByName(b1).unionByName(b2), terms)
      .orderBy("term").as[(String, Long, Long)].collect().toSeq
    fresh shouldBe Seq(("red", 2L, 4L), ("widget", 2L, 4L))
    // both log orders land on the fresh recompute — appends commute
    Seq(delta(b1, 1).unionByName(delta(b2, 2)),
        delta(b2, 2).unionByName(delta(b1, 1))).foreach { log =>
      QueryCompiler.idfStatsWithDeltas(stats0, log)
        .orderBy("term").as[(String, Long, Long)].collect().toSeq shouldBe fresh
    }
  }

  test("maintainIdfStats: the changed-id window probes as a broadcast semi join, never an IN literal") {
    val v1 = Seq("001" -> "red fox", "002" -> "plain").toDF("id", "dataSample")
    val stats1 = QueryCompiler.idfStatsTable(v1, Seq("red"))
    val changes = Seq(("002", "upsert", "red now"))
      .toDF("id", "change_op", "dataSample")
    val plan = QueryCompiler.maintainIdfStats(stats1, v1, changes, Seq("red"))
      .queryExecution.optimizedPlan.toString
    // the form that survives a window growing with the corpus: a 10^5-id
    // backfill stays one broadcast probe where a literal list would stop
    // pushing and bloat the plan
    plan should not include " IN ("
    plan should include("LeftSemi")
  }

  test("maintainIdfStats: an empty feed window is the identity, df-0 terms keep their rows") {
    val v1 = Seq("001" -> "red fox").toDF("id", "dataSample")
    val stats1 = QueryCompiler.idfStatsTable(v1, Seq("red", "absent"))
    val changes = Seq.empty[(String, String, String)]
      .toDF("id", "change_op", "dataSample")
    val out = QueryCompiler.maintainIdfStats(stats1, v1, changes, Seq("red", "absent"))
      .orderBy("term").as[(String, Long, Long)].collect().toSeq
    out shouldBe Seq(("absent", 0L, 1L), ("red", 1L, 1L))
  }

  test("idfStatsTable: one pass — null-text docs count toward n_docs, df-0 and duplicate-token docs exact") {
    val corpus = Seq(
      Some("red red widget"), // duplicate token: df counts the DOC once
      None,                   // null text: no memberships, still a doc
      Some("plain words"))
      .toDF("dataSample")
    val out = QueryCompiler.idfStatsTable(corpus, Seq("red", "widget", "absent"))
      .orderBy("term").as[(String, Long, Long)].collect().toSeq
    out shouldBe Seq(("absent", 0L, 3L), ("red", 1L, 3L), ("widget", 1L, 3L))
  }
}
