package graft

import graft.analyzers.Analyzers
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The native codegen tokenizers must be bit-equivalent to the regex
  * Column pipelines they replace — checked on hand-picked edge cases and
  * seeded random strings.
  */
class TokenizeExprSpec extends AnyFunSuite with Matchers with SparkSupport {
  import spark.implicits._

  private val edgeCases = Seq(
    "", " ", "...", "a", "A B c", "hello,world", "x  y\t z",
    "http://www.example.com/foo-bar", "café naïve Über",
    "123 abc123 Ⅳ ½", // roman numeral Nl, fraction No
    "😀 emoji gap", "ends.", ".starts", "a-b_c.d",
    "HTTP://WWW.COM", "ftp ftpx xftp", "中文 tokens"
  )

  private def viaBoth(input: Seq[String], std: Boolean): (Seq[Seq[String]], Seq[Seq[String]]) = {
    val df = input.toDF("s")
    val native = df.select(
      if (std) Analyzers.standardTokens($"s") else Analyzers.uriTokens($"s"))
      .as[Seq[String]].collect().toSeq
    val regex = df.select(
      if (std) Analyzers.standardTokensRegex($"s") else Analyzers.uriTokensRegex($"s"))
      .as[Seq[String]].collect().toSeq
    (native, regex)
  }

  test("standard tokens: native ≡ regex on edge cases") {
    val (n, r) = viaBoth(edgeCases, std = true)
    n shouldBe r
  }

  test("uri tokens: native ≡ regex on edge cases (stopwords dropped, duplicates kept)") {
    val (n, r) = viaBoth(edgeCases :+ "a.com/x/x/http/z", std = false)
    n shouldBe r
  }

  test("property: native ≡ regex on seeded random strings") {
    val rnd = new scala.util.Random(42)
    // chars only (no surrogate pairs — indexing would split them);
    // supplementary codepoints are covered by the emoji edge case above
    val alphabet = "abcXYZ012 .,/-:\t霸é中Ⅳ½"
    val samples = Seq.fill(60)(
      Seq.fill(rnd.nextInt(50))(alphabet(rnd.nextInt(alphabet.length))).mkString)
    val (n, r) = viaBoth(samples, std = true)
    n shouldBe r
    val (nu, ru) = viaBoth(samples, std = false)
    nu shouldBe ru
  }

  test("SQL registration: graft_tokenize / graft_uri_tokenize callable from SQL") {
    GraftFunctions.register(spark)
    spark.sql("SELECT graft_tokenize('Red, Widget!') AS t")
      .as[Seq[String]].head() shouldBe Seq("red", "widget")
    spark.sql("SELECT graft_uri_tokenize('http://www.example.com/red') AS t")
      .as[Seq[String]].head() shouldBe Seq("example", "red")
  }

  test("weight-sum kernel: equals the declarative map-literal fold, including misses and negatives") {
    import org.apache.spark.sql.functions.{aggregate, coalesce, element_at, lit, typedLit}
    val w = Map("red" -> 5L, "widget" -> -3L, "the" -> 1L)
    val docs = Seq(
      "the red red widget", // 1 + 5 + 5 - 3 = 8
      "nothing matches here", // 0
      "", // empty token array
      "widget widget widget") // -9
      .toDF("text")
    val toks = Analyzers.standardTokens(col("text"))
    val native = docs.select(
      graft.functions.Tokenize.weightSum(toks, w).as("s")).as[Long].collect()
    val wmap = typedLit(w)
    val declared = docs.select(
      aggregate(toks, lit(0L),
        (acc, t) => acc + coalesce(element_at(wmap, t), lit(0L))).as("s"))
      .as[Long].collect()
    native shouldBe declared
    native shouldBe Array(8L, 0L, 0L, -9L)
    // empty table: every score 0 (serving-path edge)
    docs.select(graft.functions.Tokenize.weightSum(toks, Map.empty[String, Long]).as("s"))
      .as[Long].collect() shouldBe Array(0L, 0L, 0L, 0L)
    // the kernel participates in codegen off a parquet-backed scan
    val plan = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(graft.functions.Tokenize.weightSum(
        Analyzers.standardTokens(col("text")), w))
      .queryExecution.executedPlan.toString
    plan should include regex """\*\(\d+\) Project \[graft_weight_sum"""
  }

  test("quality-micros kernel: equals the declarative integer blend on random and edge docs") {
    import org.apache.spark.sql.functions.{array_distinct, filter, least, lit, pmod, shiftright, when}
    val size = (c: org.apache.spark.sql.Column) => org.apache.spark.sql.functions.size(c)
    val stop = graft.analyzers.Analyzers.EnglishStopwords
    val rnd = new scala.util.Random(11)
    val pool = stop.take(8) ++ Seq("alpha", "beta", "gamma", "zq", "xv")
    val samples = Seq("", "the", "zq", "the the the") ++ Seq.fill(40)(
      Seq.fill(1 + rnd.nextInt(120))(pool(rnd.nextInt(pool.size))).mkString(" "))
    val docs = samples.toDF("text")
    val toks = Analyzers.standardTokens(col("text"))
    // the declarative integer blend the kernel replaced, rebuilt inline
    val nTok = size(toks).cast("long")
    val nStop = size(filter(toks, w => w.isInCollection(stop))).cast("long")
    val nDist = size(array_distinct(toks)).cast("long")
    val num = lit(2L) * least(nTok, lit(100L)) * nTok + lit(150L) * (nStop + nDist)
    val den = lit(500L) * nTok
    val scaled = lit(1000000L) * num + shiftright(den, 1)
    val declared = when(nTok > 0L,
      ((scaled - pmod(scaled, den)).cast("double") / den.cast("double")).cast("long"))
      .otherwise(lit(0L))
    val n = docs.select(graft.functions.Tokenize.qualityMicros(toks, stop).as("m"))
      .as[Long].collect()
    val d = docs.select(declared.as("m")).as[Long].collect()
    n shouldBe d
    n.head shouldBe 0L // empty doc
    // kernel participates in codegen off a parquet-backed scan
    val plan = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(graft.functions.Tokenize.qualityMicros(
        Analyzers.standardTokens(col("text")), stop))
      .queryExecution.executedPlan.toString
    plan should include regex """\*\(\d+\) Project \[graft_quality_micros"""
  }

  test("phrase-count kernel: equals the declarative positional conjunction on random arrays, L=1 is term frequency") {
    import org.apache.spark.sql.functions.{element_at, filter, lit, sequence, when}
    val asize = org.apache.spark.sql.functions.size _
    val rnd = new scala.util.Random(11)
    val alphabet = Seq("red", "plate", "widget", "hot", "rod")
    val docs = (0 until 300).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(12))(alphabet(rnd.nextInt(alphabet.length))).mkString(" "))
    }.toDF("doc_id", "text")
    val toks = Analyzers.standardTokens(col("text"))
    for (terms <- Seq(Seq("red"), Seq("red", "plate"), Seq("hot", "rod", "red"))) {
      val l = terms.length
      val declared = when(asize(toks) >= l,
        asize(filter(sequence(lit(1), asize(toks) - lit(l - 1)),
          i => terms.zipWithIndex.map { case (w, j) =>
            element_at(toks, (i + lit(j)).cast("int")) === lit(w)
          }.reduce(_ && _)))).otherwise(lit(0)).cast("long")
      val native = docs.orderBy("doc_id")
        .select(graft.functions.Tokenize.phraseCount(toks, terms)).as[Long].collect()
      val decl = docs.orderBy("doc_id").select(declared).as[Long].collect()
      native.toSeq shouldBe decl.toSeq
    }
    // L=1 ≡ plain term frequency
    val tf1 = docs.orderBy("doc_id")
      .select(graft.functions.Tokenize.phraseCount(toks, Seq("red"))).as[Long].collect()
    val tfD = docs.orderBy("doc_id")
      .select(asize(filter(toks, x => x === lit("red"))).cast("long")).as[Long].collect()
    tf1.toSeq shouldBe tfD.toSeq
    // kernel participates in codegen off a parquet-backed scan
    val plan = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(graft.functions.Tokenize.phraseCount(
        Analyzers.standardTokens(col("text")), Seq("the", "data")))
      .queryExecution.executedPlan.toString
    plan should include regex """\*\(\d+\) Project \[graft_phrase_count"""
  }

  test("ngrams native kernel: ≡ HOF reference (positional and distinct tiers), inside codegen") {
    import org.apache.spark.sql.functions.{array, array_distinct, concat_ws, greatest, lit, slice, when, zip_with}
    val asize = org.apache.spark.sql.functions.size _
    // the HOF formulation TextAnalysis.ngrams replaced (r17) — kept here as
    // the executable spec the native kernel is held to
    def hofNgrams(toks: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column = {
      val len = greatest(asize(toks) - (n - 1), lit(0))
      val shifted = (0 until n).map(k => slice(toks, lit(k + 1), len))
      when(asize(toks) < n, array().cast("array<string>"))
        .otherwise(shifted.reduce((a, b) => zip_with(a, b, (x, y) => concat_ws(" ", x, y))))
    }
    val rnd = new scala.util.Random(7)
    val pool = Seq("a", "b", "c", "dd", "e")
    val samples = Seq("", "a", "a b", "a b c", "a a a a", "x y x y x y") ++
      Seq.fill(50)(Seq.fill(rnd.nextInt(30))(pool(rnd.nextInt(pool.size))).mkString(" "))
    val docs = samples.toDF("text")
    val toks = Analyzers.standardTokens(col("text"))
    for (n <- Seq(2, 3, 8)) {
      val native = docs.select(graft.functions.Tokenize.ngrams(toks, n))
        .as[Seq[String]].collect().toSeq
      val hof = docs.select(hofNgrams(toks, n)).as[Seq[String]].collect().toSeq
      native shouldBe hof
      val nd = docs.select(graft.functions.Tokenize.ngrams(toks, n, distinct = true))
        .as[Seq[String]].collect().toSeq
      val hd = docs.select(array_distinct(hofNgrams(toks, n)))
        .as[Seq[String]].collect().toSeq
      nd shouldBe hd
    }
    val plan = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(graft.functions.Tokenize.ngrams(Analyzers.standardTokens(col("text")), 3))
      .queryExecution.executedPlan.toString
    plan should include regex """\*\(\d+\) Project \[graft_ngrams"""
  }

  test("codegen: tokenizer runs inside WholeStageCodegen (not interpreted fallback)") {
    // parquet-backed source — a LocalRelation constant-folds away the stage
    val plan = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(Analyzers.standardTokens(col("text")))
      .queryExecution.executedPlan.toString
    // '*(n) Project [graft_tokenize(...)' = the expression inside a codegen stage
    plan should include regex """\*\(\d+\) Project \[graft_tokenize"""
  }
}
