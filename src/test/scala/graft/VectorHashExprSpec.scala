package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The native vector/hash kernels must be bit-equivalent to the interpreted
  * HOF pipelines they replaced (VectorHash.scala documents the contract) —
  * the oracle gate hashes values, so "close" is not enough.
  */
class VectorHashExprSpec extends AnyFunSuite with Matchers with SparkSupport {
  import spark.implicits._

  // scalatest Matchers shadows functions.size
  private val sqlSize = org.apache.spark.sql.functions.size _

  // HOF twins, verbatim from the pre-native operator implementations
  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
  private def hofNorm(a: org.apache.spark.sql.Column) =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))
  private def hofMinhash(sh: org.apache.spark.sql.Column, k: Int) =
    transform(sequence(lit(0), lit(k - 1)), i => array_min(transform(sh, s => xxhash64(i, s))))
  private def hofSimhash(hashes: org.apache.spark.sql.Column) = {
    val bit = (p: org.apache.spark.sql.Column) => {
      val votes = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(call_function("shiftright", h, p).bitwiseAND(1L) === 1L, 1L)
          .otherwise(-1L))
      when(votes >= 0L, call_function("shiftleft", lit(1L), p)).otherwise(0L)
    }
    aggregate(sequence(lit(0), lit(63)), lit(0L), (acc, p) => acc.bitwiseOR(bit(p)))
  }
  private def hofSrp(emb: org.apache.spark.sql.Column, bits: Int) =
    transform(sequence(lit(0), lit(bits - 1)), p => {
      val plane = (d: org.apache.spark.sql.Column) =>
        (pmod(xxhash64(p, d), lit(100000L)).cast("double") / 100000.0) - 0.5
      val proj = aggregate(zip_with(emb, sequence(lit(0), sqlSize(emb) - 1),
        (x, d) => x.cast("double") * plane(d)), lit(0.0), (acc, v) => acc + v)
      when(proj >= 0.0, 1).otherwise(0)
    })

  private val rnd = new scala.util.Random(7)
  private def vecs = Seq.fill(40)(Array.fill(64)(rnd.nextFloat() - 0.5f)).toDF("v")

  test("graft_dot / graft_norm ≡ interpreted HOF sums, bit for bit") {
    val df = vecs.withColumn("w", reverse($"v"))
    val rows = df.select(
      graft.operators.Similarity.dot($"v", $"w").as("nd"), hofDot($"v", $"w").as("hd"),
      graft.operators.Similarity.norm($"v").as("nn"), hofNorm($"v").as("hn"))
      .as[(Double, Double, Double, Double)].collect()
    rows.foreach { case (nd, hd, nn, hn) => nd shouldBe hd; nn shouldBe hn }
  }

  test("graft_minhash ≡ HOF signature, including empty input (k nulls) and null shingles") {
    val docs = Seq(Seq("a b", "b c", "c d"), Seq("x y"), Seq.empty[String],
      Seq("a b", null)).toDF("sh")
    val rows = docs.select(
      graft.operators.Dedup.minhashSignature($"sh", 16).as("n"),
      hofMinhash($"sh", 16).as("h"))
      .as[(Seq[Option[Long]], Seq[Option[Long]])].collect()
    rows.foreach { case (n, h) => n shouldBe h }
  }

  test("null algebra: ragged/null-element inputs return null like the HOF twins") {
    val df = Seq(
      (Seq[Option[Float]](Some(1f), None), Seq[Option[Float]](Some(1f), Some(2f))),
      (Seq[Option[Float]](Some(1f)), Seq[Option[Float]](Some(1f), Some(2f))) // ragged
    ).toDF("a", "b")
    val rows = df.select(
      graft.operators.Similarity.dot($"a", $"b").as("nd"), hofDot($"a", $"b").as("hd"),
      graft.operators.Similarity.norm($"a").as("nn"), hofNorm($"a").as("hn"))
      .as[(Option[Double], Option[Double], Option[Double], Option[Double])].collect()
    rows.foreach { case (nd, hd, nn, hn) => nd shouldBe hd; nn shouldBe hn }
    // simhash: a null hash votes −1 on every bit in BOTH formulations (the
    // HOF's when(...).otherwise(-1) turns the null bit-test into the else
    // branch) — the results are equal and non-null
    val sh = Seq(Seq[Option[Long]](Some(5L), None)).toDF("hashes")
    sh.select(graft.operators.Dedup.simhashFromHashes($"hashes").as("n"),
      hofSimhash($"hashes").as("h"))
      .as[(Option[Long], Option[Long])].head() match {
      case (n, h) => n shouldBe h
    }
    // srp: a null element — or an empty array — zeroes every sign bit in
    // both formulations
    val emb = Seq(Seq[Option[Float]](Some(1f), None), Seq.empty[Option[Float]]).toDF("v")
    emb.select(graft.operators.Similarity.srpSignature($"v", 8).as("n"), hofSrp($"v", 8).as("h"))
      .as[(Seq[Int], Seq[Int])].collect()
      .foreach { case (n, h) => n shouldBe h }
  }

  test("graft_simhash ≡ HOF vote loop on random token-hash arrays") {
    val docs = Seq.fill(30)(Seq.fill(1 + rnd.nextInt(40))(rnd.nextLong())).toDF("hashes")
    val rows = docs.select(graft.operators.Dedup.simhashFromHashes($"hashes").as("n"),
      hofSimhash($"hashes").as("h")).as[(Long, Long)].collect()
    rows.foreach { case (n, h) => n shouldBe h }
  }

  test("graft_srp_sig ≡ HOF sign-random-projection signature") {
    val rows = vecs.select(
      graft.operators.Similarity.srpSignature($"v", 24).as("n"),
      hofSrp($"v", 24).as("h")).as[(Seq[Int], Seq[Int])].collect()
    rows.foreach { case (n, h) => n shouldBe h }
  }

  test("graft_jaccard ≡ intersect/distinct-union expressions on distinct arrays") {
    val words = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val docs = Seq.fill(40)((
      rnd.shuffle(words).take(1 + rnd.nextInt(7)),
      rnd.shuffle(words).take(1 + rnd.nextInt(7)))).toDF("sa", "sb")
    val rows = docs.select(
      graft.functions.VectorHash.jaccardCol($"sa", $"sb").as("n"),
      (org.apache.spark.sql.functions.size(array_intersect($"sa", $"sb")).cast("double") /
        org.apache.spark.sql.functions.size(array_distinct(concat($"sa", $"sb")))).as("h"))
      .as[(Double, Double)].collect()
    rows.foreach { case (n, h) => n shouldBe h }
    // 0/0 edge: both empty → NaN, like the division expression
    Seq((Seq.empty[String], Seq.empty[String])).toDF("sa", "sb")
      .select(graft.functions.VectorHash.jaccardCol($"sa", $"sb"))
      .as[Double].head().isNaN shouldBe true
  }

  test("SQL registration + codegen for the vector kernels") {
    GraftFunctions.register(spark)
    spark.sql("SELECT graft_dot(array(1.0f, 2.0f), array(3.0f, 4.0f)) AS d")
      .as[Double].head() shouldBe 11.0
    spark.sql("SELECT graft_minhash(array('a','b'), 4) AS s")
      .as[Seq[Long]].head() should have size 4
    // parquet-backed, so the projection sits in a real codegen stage
    val plan = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(graft.operators.Similarity.norm(col("embedding")))
      .queryExecution.executedPlan.toString
    plan should include regex """\*\(\d+\) Project \[graft_norm"""
  }
}
