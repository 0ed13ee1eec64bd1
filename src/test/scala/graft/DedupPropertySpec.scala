package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Structural invariants of the dedup/similarity family over seeded random
  * corpora — properties the oracle can't see (it only checks fixed inputs):
  * pair orientation, survivor partitioning, threshold monotonicity, and
  * exact-dup guarantees that hold for EVERY input.
  */
class DedupPropertySpec extends AnyFunSuite with Matchers with SparkSupport {
  import spark.implicits._

  private val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
    "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron", "pi")

  /** Seeded corpus: random docs + planted exact dups + planted near-dups. */
  private def corpus(seed: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    def doc() = Seq.fill(12 + rnd.nextInt(20))(words(rnd.nextInt(words.length))).mkString(" ")
    val originals = (0L until 20L).map(i => i -> doc())
    val exactDups = originals.take(4).map { case (i, t) => (100L + i) -> t }
    val nearDups = originals.slice(4, 8).map { case (i, t) =>
      (200L + i) -> (t + " " + words(rnd.nextInt(words.length)))
    }
    (originals ++ exactDups ++ nearDups).toDF("doc_id", "text")
  }

  test("property: every planted exact duplicate pair is found by every dedup tier") {
    for (seed <- 1 to 3) {
      val d = corpus(seed)
      val expect = (0L until 4L).map(i => (i, 100L + i)).toSet
      val jac = Dedup.jaccardPairs(d).select("a_id", "b_id").as[(Long, Long)].collect().toSet
      val mh = Dedup.minhashPairs(d).select("a_id", "b_id").as[(Long, Long)].collect().toSet
      val sh = Dedup.simhashPairs(d).select("a_id", "b_id").as[(Long, Long)].collect().toSet
      expect.foreach { p => jac should contain(p); mh should contain(p); sh should contain(p) }
    }
  }

  test("property: containment catches excerpt⊂source pairs that Jaccard misses") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      def doc() = Seq.fill(40 + rnd.nextInt(20))(words(rnd.nextInt(words.length))).mkString(" ")
      val originals = (0L until 10L).map(i => i -> doc())
      // 25% prefixes: containment 1.0, Jaccard ≈ 0.25
      val excerpts = originals.take(3).map { case (i, t) =>
        (500L + i) -> t.split(" ").take(12).mkString(" ")
      }
      val d = (originals ++ excerpts).toDF("doc_id", "text")
      val cont = Dedup.containmentPairs(d).select("a_id", "b_id")
        .as[(Long, Long)].collect().toSet
      val jac = Dedup.jaccardPairs(d).select("a_id", "b_id")
        .as[(Long, Long)].collect().toSet
      val planted = (0L until 3L).map(i => (i, 500L + i)).toSet
      planted.foreach { p =>
        cont should contain(p)
        jac should not contain p
      }
    }
  }

  test("property: planted near-dup signatures stay near; unrelated docs stay far") {
    // the nonzero-Hamming regime the registered d4 entry deliberately
    // excludes (its oracle-checkable corpus pins Hamming 0), asserted at the
    // signature level: one appended token only flips vote bits whose margin
    // it crosses — on short 12-31-token docs (margins O(√n)) that can exceed
    // the default ball of 3 but stays far below the ~32 of an unrelated
    // pair. (The banded operator itself only GUARANTEES recall ≤ 3 by
    // pigeonhole, which is why this property is checked on raw signatures.)
    for (seed <- 1 to 3) {
      val d = corpus(seed)
      val sigs = d.select($"doc_id", Dedup.simhash($"text").as("sig"))
        .as[(Long, Long)].collect().toMap
      for (i <- 4L until 8L)
        java.lang.Long.bitCount(sigs(i) ^ sigs(200L + i)) should be <= 12
      // separation: even a same-vocabulary unrelated pair sits beyond the
      // near-dup bound (a tight margin — these docs share a 16-word lexicon)
      java.lang.Long.bitCount(sigs(8L) ^ sigs(9L)) should be > 12
    }
  }

  test("property: pairs are strictly ordered (a_id < b_id) and unique in every tier") {
    val d = corpus(7)
    Seq(Dedup.jaccardPairs(d), Dedup.minhashPairs(d), Dedup.simhashPairs(d),
      Similarity.cosineNearDupPairs(
        d.select($"doc_id".as("vec_id"),
          org.apache.spark.sql.functions.transform(
            org.apache.spark.sql.functions.sequence(
              org.apache.spark.sql.functions.lit(0), org.apache.spark.sql.functions.lit(15)),
            i => (org.apache.spark.sql.functions.xxhash64($"doc_id", i)
              .cast("double") / 1e18).cast("float")).as("embedding")),
        threshold = 0.5)
    ).foreach { pairs =>
      val rows = pairs.select("a_id", "b_id").as[(Long, Long)].collect()
      rows.foreach { case (a, b) => a should be < b }
      rows.length shouldBe rows.toSet.size
    }
  }

  test("property: survivors and collapsed docs partition the corpus; survivors contain each group's min id") {
    for (seed <- 11 to 13) {
      val d = corpus(seed)
      val pairs = Dedup.jaccardPairs(d)
      val survivors = Dedup.fuzzyDedupSurvivors(d, pairs).as[Long].collect().toSet
      val all = d.select("doc_id").as[Long].collect().toSet
      val collapsed = all -- survivors
      // collapsed docs are exactly the b-side of some pair (min-id representative wins)
      val bSides = pairs.select("b_id").as[Long].collect().toSet
      collapsed shouldBe (bSides intersect all)
      // every pair's a-side either survives or is itself collapsed into a smaller id
      survivors should contain(all.min)
    }
  }

  test("property: raising the Jaccard threshold only shrinks the pair set") {
    val d = corpus(21)
    val loose = Dedup.jaccardPairs(d, threshold = 0.5, maxDf = 50)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val strict = Dedup.jaccardPairs(d, threshold = 0.9, maxDf = 50)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    strict.subsetOf(loose) shouldBe true
  }

  test("repeatedSpans: hand-computed spans — cross-doc, within-doc, island merge, short-doc exclusion") {
    // k=3 windows. Docs 1 and 2 share tokens "c d e f g": doc-1 windows at
    // positions 2,3,4 repeat in doc 2 (positions 0,1,2) → one merged island
    // per doc, a 5-token span each. Doc 3 repeats "x y z" WITHIN itself:
    // only the "x y z" window repeats (positions 0 and 3; "y z x"/"z x y"
    // occur once each), so the hit positions are non-adjacent → two
    // separate 3-token spans. Doc 4 is shorter than k → no windows, absent.
    val docs = Seq(
      (1L, "a b c d e f g"),        // tokens 0..6
      (2L, "c d e f g h i"),        // shares c d e f g
      (3L, "x y z x y z"),          // within-doc repeat of "x y z"
      (4L, "p q")                   // too short
    ).toDF("doc_id", "text")
    val spans = Dedup.repeatedSpans(docs, k = 3)
      .orderBy("doc_id", "start_tok")
      .select("doc_id", "start_tok", "end_tok", "n_tokens")
      .as[(Long, Int, Int, Long)].collect().toSeq
    spans shouldBe Seq(
      (1L, 2, 6, 5L),  // "c d e f g"
      (2L, 0, 4, 5L),  // same substring at its own positions
      (3L, 0, 2, 3L),  // first "x y z"
      (3L, 3, 5, 3L)   // second "x y z" — positions 0 and 3 aren't adjacent, so two islands
    )
  }

  test("repeatedSpans: adjacent repeated windows merge into one maximal span") {
    // both docs identical, 6 tokens, k=3 → windows at 0..3 all repeat →
    // ONE island covering the whole doc, not four 3-token spans
    val docs = Seq((1L, "m n o p q r"), (2L, "m n o p q r")).toDF("doc_id", "text")
    val spans = Dedup.repeatedSpans(docs, k = 3)
      .select("doc_id", "start_tok", "end_tok", "n_tokens")
      .orderBy("doc_id").as[(Long, Int, Int, Long)].collect().toSeq
    spans shouldBe Seq((1L, 0, 5, 6L), (2L, 0, 5, 6L))
  }

  test("dupTokenLoad: full duplicates load 1.0, partial overlap exact fraction, clean docs 0") {
    val docs = Seq(
      (1L, "m n o p q r"),          // identical twin → 6/6 duplicated
      (2L, "m n o p q r"),
      (3L, "a b c d e f g h i j"),  // shares no 3-window with anyone → 0
      (4L, "z z m n o p q r")       // windows at pos 2..5 repeat → tokens 2..7 duplicated
    ).toDF("doc_id", "text")
    val out = Dedup.dupTokenLoad(docs, k = 3)
      .select("doc_id", "n_tokens", "dup_tokens", "dup_frac")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    out(1L) shouldBe ((1L, 6L, 6L, 1.0))
    out(2L) shouldBe ((2L, 6L, 6L, 1.0))
    out(3L) shouldBe ((3L, 10L, 0L, 0.0))
    out(4L) shouldBe ((4L, 8L, 6L, 0.75)) // tokens 2-7 inside the repeated span
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("removeRepeatedWindows: first occurrence kept, later twin cut entirely, within-doc repeat trimmed") {
    val docs = Seq(
      (1L, "m n o p q r"),   // identical twin — first occurrence, survives intact
      (2L, "m n o p q r"),   // every window already seen in doc 1 → fully cut
      (3L, "x y z x y z")    // within-doc repeat: "x y z" at p0 kept, p3 cut
    ).toDF("doc_id", "text")
    val out = Dedup.removeRepeatedWindows(docs, k = 3)
      .select("doc_id", "n_tokens", "removed_tokens", "clean_hash")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    out(1L) shouldBe ((1L, 6L, 0L, md5hex("m n o p q r")))
    out(2L) shouldBe ((2L, 6L, 6L, md5hex("")))
    out(3L) shouldBe ((3L, 6L, 3L, md5hex("x y z")))
  }

  test("removeRepeatedWindows closes d12's boundary-extension caveat: shared-content islands with different boundaries ARE cut") {
    // Doc 1's island over "c d e f g" extends to "c d e f g h" because
    // "f g h" also repeats (doc 3); doc 2's island is bare "c d e f g".
    // d12 keys on maximal-island CONTENT → three distinct keys, nothing
    // removed (the documented under-removal). d13 keys on the windows
    // themselves → doc 2 loses "c d e f g", doc 3 loses "f g h".
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "z c d e f g q r"),
      (3L, "f g h u v w")
    ).toDF("doc_id", "text")
    val d12 = Dedup.removeRepeatedSpans(docs, k = 3)
      .select("doc_id", "removed_tokens").as[(Long, Long)].collect().toMap
    d12 shouldBe Map(1L -> 0L, 2L -> 0L, 3L -> 0L) // the caveat, pinned
    val d13 = Dedup.removeRepeatedWindows(docs, k = 3)
      .select("doc_id", "n_tokens", "removed_tokens", "clean_hash")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    d13(1L) shouldBe ((1L, 8L, 0L, md5hex("a b c d e f g h")))
    d13(2L) shouldBe ((2L, 8L, 5L, md5hex("z q r")))
    d13(3L) shouldBe ((3L, 6L, 3L, md5hex("u v w")))
  }

  test("removeRepeatedWindows: overlapping cut windows merge — removed_tokens never double-counts") {
    // doc 2 repeats doc 1's full text twice with a unique separator: cut
    // windows overlap densely; removed_tokens must equal the true token
    // union, and the rebuilt text must keep only the separator
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "a b c d e sep a b c d e")
    ).toDF("doc_id", "text")
    val out = Dedup.removeRepeatedWindows(docs, k = 3)
      .select("doc_id", "n_tokens", "removed_tokens", "clean_hash")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    out(1L) shouldBe ((1L, 5L, 0L, md5hex("a b c d e")))
    // doc 2: every window except those containing "sep" repeats; windows
    // "c d e"(2), "a b c"(6).. all cut; tokens 0..4 and 6..10 removed
    out(2L) shouldBe ((2L, 11L, 10L, md5hex("sep")))
  }

  test("capped collect kernel: exact df always; complete list below the cap; bounded above it") {
    import org.apache.spark.sql.functions.{col, array_sort, collect_list, count, size, struct}
    // heavy-tailed keys: key k appears k times (k = 1..40), values distinct
    val rows = for (k <- 1 to 40; i <- 1 to k) yield (s"k$k", k.toLong * 1000 + i)
    val df = rows.toDF("s", "doc_id").repartition(7) // force partial/merge paths
    val cap = 21 // maxDf = 20 consumer shape
    val got = df.groupBy("s")
      .agg(graft.functions.CappedCollect.ids(col("doc_id"), cap).as("cl"))
      .select(col("s"), col("cl.df").as("df"), array_sort(col("cl.ids")).as("ids"))
      .as[(String, Long, Seq[Long])].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val ref = df.groupBy("s")
      .agg(count(col("doc_id")).as("df"), array_sort(collect_list(col("doc_id"))).as("ids"))
      .as[(String, Long, Seq[Long])].collect().map(r => r._1 -> (r._2, r._3)).toMap
    for (k <- 1 to 40) {
      val (gotDf, gotIds) = got(s"k$k")
      gotDf shouldBe k.toLong // df exact on every key, hot or not
      if (k < cap) gotIds shouldBe ref(s"k$k")._2 // complete below the cap
      else {
        gotIds.length shouldBe cap // bounded above it — the §5 memory contract
        gotIds.toSet.subsetOf(ref(s"k$k")._2.toSet) shouldBe true
      }
    }
  }

  test("blockedIdPairs unchanged by the capped kernel: equals the uncapped count-filter reference") {
    import org.apache.spark.sql.functions.{col, collect_list, count, explode, array_sort, posexplode, slice, greatest, lit}
    import org.apache.spark.sql.functions.{size => asize}
    for (seed <- 1 to 2) {
      val d = corpus(seed)
      val pairs = Dedup.jaccardPairs(d, maxDf = 5, minShared = 2)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      // reference blocking: plain collect_list with a size filter (the r17
      // shape), identical expansion
      val sh = d.select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
      val lists = sh.select(col("doc_id"), explode(col("sh")).as("s"))
        .groupBy("s").agg(collect_list(col("doc_id")).as("ids"))
        .where(asize(col("ids")).between(2, 5))
        .select(array_sort(col("ids")).as("ids"))
      val refPairs = lists
        .select(col("ids"), posexplode(col("ids")).as(Seq("p", "a_id")))
        .select(col("a_id"), explode(slice(col("ids"), col("p") + 2,
          greatest(asize(col("ids")) - col("p") - 1, lit(0)))).as("b_id"))
        .groupBy("a_id", "b_id").agg(count(lit(1)).as("n"))
        .where(col("n") >= 2).select("a_id", "b_id")
      val j = graft.functions.VectorHash.jaccardCol(col("sa"), col("sb"))
      val refVerified = refPairs
        .join(sh.select(col("doc_id").as("a_id"), col("sh").as("sa")), "a_id")
        .join(sh.select(col("doc_id").as("b_id"), col("sh").as("sb")), "b_id")
        .where(org.apache.spark.sql.functions.round(j, 6) >= 0.8)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      pairs shouldBe refVerified
    }
  }

  test("property: exact dedup output ids are minimal per hash and cover all distinct texts") {
    val d = corpus(31)
    val out = Dedup.exact(d).select("doc_id", "content_hash")
      .as[(Long, String)].collect()
    out.length shouldBe d.select("text").distinct().count()
    // representative is the minimum doc_id of its identity group
    val byText = d.as[(Long, String)].collect().groupBy(_._2)
    val minIds = byText.values.map(_.map(_._1).min).toSet
    out.map(_._1).toSet shouldBe minIds
  }
}
