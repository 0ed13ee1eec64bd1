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

  test("codegen: tokenizer runs inside WholeStageCodegen (not interpreted fallback)") {
    // parquet-backed source — a LocalRelation constant-folds away the stage
    val plan = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(Analyzers.standardTokens(col("text")))
      .queryExecution.executedPlan.toString
    // '*(n) Project [graft_tokenize(...)' = the expression inside a codegen stage
    plan should include regex """\*\(\d+\) Project \[graft_tokenize"""
  }
}
