package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Learned-BPE specs: hand-computed merge sequences on planted corpora,
  * the run-merging semantics the wrapped-string encoding exists for, and
  * the encode/decode roundtrip invariant. The t17 entry additionally
  * value-gates the first learned merge and the one-merge token count
  * against an independent DuckDB recompute on the sf corpus.
  */
class BpeSpec extends AnyFunSuite with Matchers with SparkSupport {
  import spark.implicits._

  private def corpus(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("trainMerges learns the hand-computed sequence on the classic corpus") {
    // word counts: low×5, lower×2, newest×6, widest×3  (Sennrich's example)
    val docs = corpus(
      (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
    val merges = Bpe.trainMerges(docs, 4)
    // pair counts round 1: (e,s)=9, (s,t)=9, (l,o)=7, … tie (e,s)/(s,t)
    // breaks lexicographically → (e,s); then (es,t)=9; then (l,o)=7; then
    // (w,es t? ) — after est: newest→n e w est, widest→w i d est:
    // (w,est)=6+0 … newest has (w,est)=6, (n,e)=6, (e,w)=6 → (e,w) wins
    // lexicographically among count-6 pairs? (n,e)=6, (e,w)=6, (w,est)=6,
    // (i,d)=3, (d,est)=3, (w,i)=3, (l,o)=7 → count 7 wins: (l,o)
    merges.take(3) shouldBe Seq(("e", "s"), ("es", "t"), ("l", "o"))
    // round 4: lo w(5) + lo wer(2) → (lo,w)=7 beats the 6-count pairs
    merges(3) shouldBe (("lo", "w"))
  }

  test("a symbol run merges pairwise in one pass (the wrapped-string guarantee)") {
    val docs = corpus("aaaa aaaa")
    val merges = Bpe.trainMerges(docs, 5)
    // (a,a) weighted 2·3=6 → merge; "aaaa" → [aa, aa] (NOT [aa, a, a] — a
    // shared-delimiter encoding would stall after the first pair); then
    // (aa,aa)=2 → merge; then nothing occurs twice → early stop
    merges shouldBe Seq(("a", "a"), ("aa", "aa"))
    val out = Seq("aaaa", "aaa", "aaaaa").toDF("w")
      .select(Bpe.encode(col("w"), merges.take(1)).as("t"))
      .as[Seq[String]].collect()
    out(0) shouldBe Seq("aa", "aa")
    out(1) shouldBe Seq("aa", "a") // odd run: leftmost-first, remainder single
    out(2) shouldBe Seq("aa", "aa", "a")
  }

  test("merge boundaries never false-match inside longer symbols") {
    // after (a,b) merges, word "xab" contains symbol ab; a later (b,c)
    // merge must not fire on the b inside ab
    val merges = Seq(("a", "b"), ("b", "c"))
    val out = Seq("xabbc", "abc").toDF("w")
      .select(Bpe.encode(col("w"), merges).as("t")).as[Seq[String]].collect()
    out(0) shouldBe Seq("x", "ab", "bc") // the freestanding (b,c) merged
    out(1) shouldBe Seq("ab", "c") // ab consumed b: (b,c) cannot re-fire
  }

  test("encode/decode roundtrip and early-stop on an exhausted vocabulary") {
    val docs = corpus("ab ab abc")
    val merges = Bpe.trainMerges(docs, 10)
    merges shouldBe Seq(("a", "b")) // (ab,c) occurs once — below the floor
    val words = Seq("ab", "abc", "zzz", "a").toDF("w")
    val rt = words.select((concat_ws("", Bpe.encode(col("w"), merges)) === col("w")).as("ok"))
      .as[Boolean].collect()
    rt.forall(identity) shouldBe true
  }
}
