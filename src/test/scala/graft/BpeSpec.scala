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

  test("driver-local trainer hash-matches the distributed trainer merge-for-merge") {
    // a corpus rich enough for 12+ merges with tie-break exercise: the
    // lowest/lower/lowest mix plus symbol runs and shared prefixes
    val docs = corpus(
      "lowest lowest lowest lower lower low low low newest newest newer",
      "widest widest wider wide wide aaaa aaaa aabb aabb ccdd ccdd",
      "stream streams streamer steam steam steel steel steep")
    val dist = Bpe.trainMerges(docs, 12)
    val local = Bpe.trainMergesLocal(docs, 12)
    local shouldBe dist
    // the local loop keeps going where the distributed gate stopped, and
    // its extension stays a strict continuation of the learned sequence
    val longer = Bpe.trainMergesLocal(docs, 25)
    longer.take(12) shouldBe dist
    longer.length should be > 12
  }

  test("local trainer reaches production merge counts (200+) on a merge-rich vocabulary") {
    // 256 distinct 10-char words over a 16-letter alphabet, each repeated
    // twice: every adjacent pair clears the count-2 floor, so the
    // learnable merge space is in the hundreds
    val alpha = "abcdefghijklmnop"
    val words = (for (i <- 0 until 256) yield
      (0 until 10).map { j =>
        alpha((((i * 2654435761L + j * 40503L + i.toLong * i * j) >>> 4) % 16).toInt)
      }.mkString).distinct
    val docs = corpus(words.flatMap(w => Seq(w, w)).mkString(" "))
    val t0 = System.nanoTime
    val local = Bpe.trainMergesLocal(docs, 5000)
    val secs = (System.nanoTime - t0) / 1e9
    local.length should be >= 200
    secs should be < 30.0 // seconds, not 2-jobs-per-merge minutes
    // spot-gate: the distributed trainer agrees on the opening sequence
    Bpe.trainMerges(docs, 8) shouldBe local.take(8)
    // exhaustion-depth encode goes through the broadcast-vocab path (a
    // 200+-deep nested replace overflows the column converter — that is
    // the point of encodeByVocab) and still roundtrips; the OOV word
    // falls back to per-char symbols
    val enc = Bpe.encodeByVocab(Seq(words.head, "zzz").toDF("w"), "w", local)
      .select(col("w"), col("tokens"))
      .as[(String, Seq[String])].collect().toMap
    enc(words.head).mkString("") shouldBe words.head
    enc(words.head).length should be < words.head.length // actually merged
    enc("zzz") shouldBe Seq("z", "z", "z")
    // and it agrees with the nested-replace encode at gate depth
    val viaReplace = Seq(words.head).toDF("w")
      .select(Bpe.encode(col("w"), local.take(20)).as("t")).as[Seq[String]].head()
    val viaVocab = Bpe.encodeByVocab(Seq(words.head).toDF("w"), "w", local.take(20))
      .select(col("tokens")).as[Seq[String]].head()
    viaVocab shouldBe viaReplace
  }

  test("local trainer: tie-breaks (count desc, left asc, right asc) and the count-2 floor") {
    // (b,a) and (a,b) both occur twice; (a,b) wins the tie by left asc
    Bpe.trainMergesOnVocab(Seq(("ab", 1L), ("ab", 1L), ("ba", 2L)), 1)
      .headOption shouldBe Some(("a", "b"))
    // nothing reaches count 2 → exhausted immediately
    Bpe.trainMergesOnVocab(Seq(("xy", 1L), ("yz", 1L)), 5) shouldBe Nil
  }

  test("fertility by language: longer-word languages fragment more; empty docs stay in the census") {
    // 'aa bb' words encode to 2 symbols under zero merges → fertility 2.0;
    // the long-word language's 6-char words encode to 6 → fertility 6.0;
    // the zero-token doc contributes (1 doc, 0 words, 0 tokens)
    val ds = Seq(
      (0L, "sh", "aa bb aa bb"),
      (1L, "sh", "bb aa"),
      (2L, "lo", "aaaaaa bbbbbb"),
      (3L, "mt", "!!!")
    ).toDF("doc_id", "lang", "text")
    val out = Bpe.fertilityByLang(ds, Nil).orderBy("lang")
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    out shouldBe Seq(
      ("lo", 1L, 2L, 12L, 6.0),
      ("mt", 1L, 0L, 0L, 0.0),
      ("sh", 2L, 6L, 12L, 2.0))
    // a learned merge reduces fertility where it applies: merging (a,a)
    // turns 'aa' into one symbol, halving the short language's tokens
    val merged = Bpe.fertilityByLang(ds, Seq(("a", "a"))).orderBy("lang")
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    merged.find(_._1 == "sh").get._4 shouldBe 9L // 3×'aa'→1 sym, 3×'bb'→2
    merged.find(_._1 == "lo").get._4 shouldBe 9L // aaaaaa→aa,aa,aa=3; bbbbbb=6
  }
}
