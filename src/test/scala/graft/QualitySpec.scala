package graft

import graft.operators.{Pipeline, Quality, SketchRollup}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Specs for the data-quality family (profile / constraints / referential
  * integrity / skew), the snapshot diff, and the KLL/theta sketch rollups.
  * Everything here is additionally value-gated by the driver's DuckDB
  * oracle on the sf tables; these specs pin the constructed edge cases the
  * organic corpus doesn't exercise (nulls, planted orphans, all four diff
  * classes, sketch-vs-exact twins).
  */
class QualitySpec extends AnyFunSuite with Matchers with SparkSupport {
  import spark.implicits._

  private def profiled: DataFrame = Seq(
    (1L, Some("a"), Some(10)),
    (2L, None, Some(20)),
    (3L, Some("b"), None),
    (4L, Some("a"), Some(10))
  ).toDF("id", "s", "v")

  test("columnProfile: completeness, cardinality and bounds per column") {
    val out = Quality.columnProfile(profiled, Seq("id", "s", "v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4),
          r.getString(5), r.getString(6))).toMap
    out("id") shouldBe ((4L, 0L, 1.0, 4L, "1", "4"))
    out("s") shouldBe ((4L, 1L, 0.75, 2L, "a", "b"))
    out("v") shouldBe ((4L, 1L, 0.75, 2L, "10", "20"))
  }

  test("columnProfile approx twin matches exact within the 1% rsd headroom") {
    val df = spark.range(0, 5000).select(col("id"),
      (col("id") % 977).as("m"), (col("id") % 5).cast("string").as("c"))
    val exact = Quality.columnProfile(df, Seq("id", "m", "c"))
      .select("column", "n_distinct").as[(String, Long)].collect().toMap
    val approx = Quality.columnProfileApprox(df, Seq("id", "m", "c"))
      .select("column", "n_distinct").as[(String, Long)].collect().toMap
    exact.foreach { case (c, nd) =>
      math.abs(approx(c) - nd).toDouble / nd should be <= 0.05
    }
    // and the shapes agree column for column
    approx.keySet shouldBe exact.keySet
  }

  test("columnProfile plans: exact form Expands for multi-distinct, approx form does not") {
    val df = spark.range(0, 100).select(col("id"), (col("id") % 7).as("m"))
    val exactPlan = Quality.columnProfile(df, Seq("id", "m"))
      .queryExecution.executedPlan.toString
    val approxPlan = Quality.columnProfileApprox(df, Seq("id", "m"))
      .queryExecution.executedPlan.toString
    exactPlan should include("Expand")
    approxPlan should not include "Expand"
  }

  test("constraintChecks: row predicates and uniqueness count violations") {
    val df = Seq(
      (1L, 1, 5.0), (1L, 1, -2.0), (2L, 1, 7.0), (3L, 2, 60.0)
    ).toDF("k", "sub", "q")
    val out = Quality.constraintChecks(df,
      rowChecks = Seq(
        "q_nonneg" -> (col("q") < 0),
        "q_below_50" -> (col("q") > 50)),
      uniqueKeys = Seq("k_sub_unique" -> Seq("k", "sub")))
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    out("q_nonneg") shouldBe ((1L, false))
    out("q_below_50") shouldBe ((1L, false))
    out("k_sub_unique") shouldBe ((1L, false)) // (1,1) twice -> excess 1
  }

  test("refIntegrity: orphan keys and null keys both count, clean FK passes") {
    val child = Seq(Some(1L), Some(2L), Some(99L), None).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val bad = Quality.refIntegrity(child, "fk", parent, "pk", "t").collect().head
    bad.getLong(1) shouldBe 4L
    bad.getLong(2) shouldBe 2L // 99 + null
    bad.getBoolean(3) shouldBe false
    val ok = Quality.refIntegrity(parent, "pk", parent, "pk", "self").collect().head
    ok.getLong(2) shouldBe 0L
    ok.getBoolean(3) shouldBe true
  }

  test("keySkewProfile: heavy key surfaces with exact distribution stats") {
    // key 7 appears 10x, keys 0..4 once each -> max 10, avg 2.5, 6 keys
    val df = (Seq.fill(10)(7L) ++ (0L to 4L)).toDF("k")
    val out = Quality.keySkewProfile(df, "k", topK = 2).collect()
    out.length shouldBe 2
    out.head.getLong(0) shouldBe 7L
    out.head.getLong(1) shouldBe 10L
    out.head.getLong(2) shouldBe 6L // n_keys
    out.head.getDouble(3) shouldBe 2.5 // avg
    out.head.getDouble(5) shouldBe 4.0 // skew = 10/2.5
    out(1).getLong(0) shouldBe 0L // tie on cnt=1 broken by key asc
  }

  test("keySkewProfile plans NO single-partition window; stats broadcast back over the persisted per-key table") {
    val df = spark.range(0, 1000).select((col("id") % 97).as("k"))
    // the planned (lazy) form: the public API eagerly materializes the
    // topK-row profile and releases the per-key cache, so the operator's
    // plan is pinned here, below the checkpoint
    val (perKey, out) = Quality.keySkewProfilePlanned(df, "k", topK = 2, exactP99 = false)
    val plan = out.queryExecution.executedPlan.toString
    perKey.unpersist()
    plan should include("TakeOrderedAndProject")
    // the per-key table can be corpus-cardinality-sized (that is the point
    // of diagnosing the key) — no Window may ever partition it to one task
    plan should not include "Window"
    // the scalar stats ride back as a 1-row broadcast, and both branches
    // read the PERSISTED per-key aggregate, never the input twice
    plan should include("BroadcastNestedLoopJoin")
    plan should include("InMemoryTableScan")
  }

  test("keySkewProfile exact twin: interpolated p99 over the per-key counts") {
    val df = (Seq.fill(10)(7L) ++ (0L to 4L)).toDF("k")
    val out = Quality.keySkewProfile(df, "k", topK = 1, exactP99 = true).collect()
    // counts sorted [1,1,1,1,1,10]: rank 0.99·5 = 4.95 → 1 + 0.95·9 = 9.55
    out.head.getDouble(4) shouldBe 9.55
  }

  test("snapshotDiff shuffles hashes, not text: the join inputs project md5 before the exchange") {
    // range-derived inputs: a LocalRelation would be constant-folded through
    // the md5 projections at optimize time and prove nothing
    val old = spark.range(0, 10).select(col("id").as("doc_id"),
      concat(lit("doc"), col("id")).as("text"))
    val neu = spark.range(5, 15).select(col("id").as("doc_id"),
      concat(lit("doc"), col("id")).as("text"))
    val plan = Pipeline.snapshotDiff(old, neu, "doc_id", Seq("text"))
      .queryExecution.optimizedPlan.toString
    // the full-outer join's children carry (id, hash, len) only — the text
    // column is consumed by md5/length projections BELOW the join, one per
    // side, so the exchange moves 16-byte hashes at any corpus width
    val lines = plan.linesIterator.toSeq
    val jIdx = lines.indexWhere(_.contains("Join FullOuter"))
    jIdx should be >= 0
    lines.drop(jIdx + 1).count(_.contains("md5(")) shouldBe 2
  }

  test("volumeDrift: trailing-mean deviation flags a collapsed and a doubled day") {
    // 10 days at 100 events/day, except day 6 collapsed to 10 and day 9
    // doubled to 200
    val rows = for (d <- 1 to 10; i <- 0 until (d match {
      case 6 => 10; case 9 => 200; case _ => 100 })) yield
      (java.sql.Timestamp.valueOf(f"2024-05-$d%02d 12:00:00"), i.toLong)
    val df = rows.toDF("ts", "i")
    val out = Quality.volumeDrift(df, "ts", lookback = 3, tolerance = 0.5)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(3)).map(_.asInstanceOf[Double]), r.getBoolean(4)))).toMap
    out("2024-05-01") shouldBe ((100L, None, false)) // no history: null dev, unflagged
    out("2024-05-02")._3 shouldBe false
    out("2024-05-06") shouldBe ((10L, Some(-0.9), true)) // collapse caught
    out("2024-05-09")._3 shouldBe true // doubled day caught
    // the day after the collapse deviates upward vs the dragged-down mean
    // ((100+100+10)/3 = 70 -> +0.428571) but stays under tolerance
    out("2024-05-07") shouldBe ((100L, Some(0.428571), false))
  }

  test("volumeDrift densifies the day axis: a ZERO-event day surfaces as dev -1, flagged") {
    // days 1,2,3,5 present — day 4 has no rows at all (the collapsed-feed
    // headline case) and must still appear, flagged, with the window
    // spanning true calendar days (day 5's window sees the zero)
    val rows = for (d <- Seq(1, 2, 3, 5); i <- 0 until 100) yield
      (java.sql.Timestamp.valueOf(f"2024-05-0$d 12:00:00"), i.toLong)
    val out = Quality.volumeDrift(rows.toDF("ts", "i"), "ts", lookback = 3, tolerance = 0.5)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(3)).map(_.asInstanceOf[Double]), r.getBoolean(4)))).toMap
    out.size shouldBe 5 // calendar-dense: the absent day is a row
    out("2024-05-04") shouldBe ((0L, Some(-1.0), true)) // dead day caught
    // day 5's trailing mean includes the zero: (100+100+0)/3 → +0.5, at
    // (not over) tolerance — present days window over CALENDAR days
    out("2024-05-05") shouldBe ((100L, Some(0.5), false))
  }

  test("seasonalVolume: weekly-cyclic feed passes the weekday baseline where the flat window false-alarms") {
    // 4 weeks starting Monday 2024-05-06: weekdays 100 events, weekends 20
    // — a healthy cyclic feed — except the LAST Sunday collapsed to 2
    val day0 = java.time.LocalDate.parse("2024-05-06")
    val rows = for {
      d <- 0 until 28
      date = day0.plusDays(d)
      n = if (d == 27) 2 else if (date.getDayOfWeek.getValue >= 6) 20 else 100
      i <- 0 until n
    } yield (java.sql.Timestamp.valueOf(date.atTime(12, 0)), i.toLong)
    val df = rows.toDF("ts", "i")
    val out = Quality.seasonalVolume(df, "ts").collect().map(r =>
      r.getString(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Double]), r.getBoolean(5)))).toMap
    out("2024-05-06") shouldBe ((1, 100L, 0L, None, false)) // first Monday: no prior
    // healthy 4th-week Saturday: dev 0 vs the 3 prior Saturdays
    out("2024-06-01") shouldBe ((6, 20L, 3L, Some(0.0), false))
    // collapsed Sunday: 2 vs prior-Sunday mean 20 → −0.9, flagged
    out("2024-06-02") shouldBe ((7, 2L, 3L, Some(-0.9), true))
    // the differentiator: the FLAT trailing window (c5) false-alarms this
    // same healthy Saturday (20 vs a weekday-dominated mean)
    val flat = Quality.volumeDrift(df, "ts").collect()
      .map(r => r.getString(0) -> r.getBoolean(4)).toMap
    flat("2024-06-01") shouldBe true
  }

  test("c14 CUSUM: an 8% persistent step is invisible to the c5 level gate but accumulates past CUSUM") {
    // 20 days at 100/day then 20 at 108/day. Closed form: baseline
    // B=7·100=700, slack=700//50=14, H=700//4=175; pre-shift dp=−14/day
    // (runmin −280 at day 20), post-shift dp = 108·7−700−14 = +42/day →
    // sp = 42·(i−19), crossing 175 five post-shift days in
    val day0 = java.time.LocalDate.parse("2024-01-01")
    val daily = (0 until 40).map { i =>
      (java.sql.Date.valueOf(day0.plusDays(i)), if (i < 20) 100L else 108L)
    }.toDF("day", "cnt")
    val rows = Quality.cusumShiftFromDaily(daily)
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
    rows.size shouldBe 40
    rows.take(20).count(_._5) shouldBe 0 // quiet before the shift
    rows.filter(_._5).map(_._1) shouldBe
      (24 until 40).map(i => day0.plusDays(i).toString) // fires 5 days in, stays on
    rows.last._3 shouldBe 42L * 20 // sp on the last day, closed form
    rows.map(_._4).max shouldBe 0L // the negative side never accumulates
    // the c5 trailing-window gate never fires: the step day deviates
    // +8% from its lookback mean, far under the 50% tolerance
    val events = daily.select(col("day").cast("timestamp").as("ts"),
      explode(expr("sequence(1, cnt)")).as("i"))
    val flat = Quality.volumeDrift(events, "ts")
    flat.where(col("flagged")).count() shouldBe 0L
  }

  test("c16 value entropy: uniform = ln k exactly, constant = 0, skew between; one melt pass") {
    val df = (0 until 64).map { i =>
      ( s"u${i % 8}", // uniform over 8 → ln 8
        "only", // constant → 0
        if (i < 63) "hot" else "cold") // 63/64 skew → far below ln 2
    }.toDF("uni", "konst", "skew")
    val got = graft.operators.Quality.valueEntropy(df, Seq("uni", "konst", "skew"))
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // uniform: 8 groups of 8, each term round(8·ln 8·1e6) = 16635532 →
    // sum 133084256 DIV 64 = 2079441 (ln 8 = 2.0794415…)
    got("uni") shouldBe (("uni", 64L, 8L, 2079441L))
    got("konst") shouldBe (("konst", 64L, 1L, 0L))
    val skewE = (math.round(63 * math.log(64.0 / 63) * 1e6) +
      math.round(1 * math.log(64.0) * 1e6)) / 64
    got("skew") shouldBe (("skew", 64L, 2L, skewE))
    got("skew")._4 should be < 693147L // far under ln 2: cardinality lies, entropy doesn't
  }

  test("c15 correlation drift: moment machinery equals a driver Pearson; zero variance reports null") {
    import graft.operators.TextAnalysis
    // varied lengths/vocabulary so quality and length genuinely co-vary
    def doc(i: Int, n: Int) = (i.toLong,
      (1 to n).map(k => s"word${k % 7}").mkString(" "))
    val v1 = (1 to 12).map(i => doc(i, 3 + i * 4)).toDF("doc_id", "text")
    val v2 = (1 to 12).filter(_ % 3 != 0).map(i => doc(i, 60 - i * 4))
      .toDF("doc_id", "text")
    val got = graft.operators.Quality.correlationDrift(v1, v2)
      .as[(Long, Option[Double], Long, Option[Double], Option[Double])]
      .collect().head
    // driver reference: plain Pearson over the SAME (micros, tokens)
    def ref(df: org.apache.spark.sql.DataFrame): Double = {
      val xs = TextAnalysis.qualityScore(df)
        .join(df.select(col("doc_id"),
          org.apache.spark.sql.functions.size(
            TextAnalysis.tokens(col("text"))).cast("long").as("y")), "doc_id")
        .select((col("quality") * 1e6).cast("long"), col("y"))
        .as[(Long, Long)].collect()
      val n = xs.length.toDouble
      val (sx, sy) = (xs.map(_._1.toDouble).sum, xs.map(_._2.toDouble).sum)
      val sxy = xs.map(t => t._1.toDouble * t._2).sum
      val sxx = xs.map(t => t._1.toDouble * t._1).sum
      val syy = xs.map(t => t._2.toDouble * t._2).sum
      val r = (n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
      BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    got._1 shouldBe 12L
    got._3 shouldBe 8L
    got._2.get shouldBe ref(v1) +- 1e-6
    got._4.get shouldBe ref(v2) +- 1e-6
    got._5.get shouldBe (math.abs(got._2.get - got._4.get) +- 1e-6)
    // zero variance on one side: r null, drift null — "undefined" never
    // aliases "no drift"
    val flat = Seq((1L, "same same"), (2L, "same same")).toDF("doc_id", "text")
    val z = graft.operators.Quality.correlationDrift(v1, flat)
      .as[(Long, Option[Double], Long, Option[Double], Option[Double])]
      .collect().head
    z._4 shouldBe None
    z._5 shouldBe None
  }

  test("seasonalVolume densifies: silent days surface as rows; zero baselines report null dev") {
    // two Mondays of data with the Wednesday between them missing entirely
    val rows = for (d <- Seq("2024-05-06", "2024-05-07", "2024-05-09",
        "2024-05-10", "2024-05-13"); i <- 0 until 50) yield
      (java.sql.Timestamp.valueOf(s"$d 08:00:00"), i.toLong)
    val out = Quality.seasonalVolume(rows.toDF("ts", "i"), "ts", weeks = 1)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), Option(r.get(4)).map(_.asInstanceOf[Double]), r.getBoolean(5)))).toMap
    out.size shouldBe 8 // calendar-dense Mon..Mon
    out("2024-05-08") shouldBe ((0L, None, false)) // first Wednesday: no prior week
    out("2024-05-11") shouldBe ((0L, None, false)) // silent Saturday is a ROW
    out("2024-05-13") shouldBe ((50L, Some(0.0), false)) // Monday vs prior Monday
    // the NEXT same-weekday obs after a dead day compares against 0 →
    // win_sum 0 → null dev (no baseline), never a divide-by-zero
    val out2 = Quality.seasonalVolume((rows ++ Seq(
        (java.sql.Timestamp.valueOf("2024-05-15 08:00:00"), 0L))).toDF("ts", "i"),
      "ts", weeks = 1).collect().map(r => r.getString(0) ->
        Option(r.get(4)).map(_.asInstanceOf[Double])).toMap
    out2("2024-05-15") shouldBe None
  }

  test("freshnessReport: staleness against the corpus high-water mark, strict flag boundary") {
    def t(s: String) = java.sql.Timestamp.valueOf(s"$s 12:00:00")
    val rows = Seq(
      ("fresh", t("2024-05-10")), ("fresh", t("2024-05-01")),
      ("edge", t("2024-04-10")), // exactly 30 days behind: NOT stale (strict >)
      ("old", t("2024-04-09"))) // 31 days behind: stale
      .toDF("grp0", "ts")
    val out = Quality.freshnessReport(rows, "grp0", "ts")
      .as[(String, Long, String, Long, Boolean)].collect().toSeq
    out shouldBe Seq(
      ("edge", 1L, "2024-04-10", 30L, false),
      ("fresh", 2L, "2024-05-10", 0L, false),
      ("old", 1L, "2024-04-09", 31L, true))
    // a group whose timestamps are ALL null has no newest record — that
    // is maximally stale (flag TRUE), with null stale_days kept visible
    val withNull = Quality.freshnessReport(
        rows.unionByName(Seq(("ghost", Option.empty[java.sql.Timestamp]))
          .toDF("grp0", "ts")), "grp0", "ts")
      .collect().map(r => r.getString(0) ->
        ((Option(r.get(2)), Option(r.get(3)), r.getBoolean(4)))).toMap
    withNull("ghost") shouldBe ((None, None, true))
  }

  test("madOutliers: lower medians in exact cents; a planted extreme can't drag the gate") {
    val rows = Seq(
      // group a (7 rows): med = 4th of sorted cents = 12, MAD = 4th of
      // sorted devs = 2; the 10⁴-dollar corruption is the ONLY row past
      // 1.5·MAD — a mean/stddev z-gate's own threshold would have chased it
      ("a", 0.10), ("a", 0.10), ("a", 0.10), ("a", 0.12), ("a", 0.12),
      ("a", 0.14), ("a", 10000.00),
      // group b (4 rows, EVEN): lower median = 2nd of sorted = 20 cents;
      // devs sorted 0,10,10,20 → MAD = 10; only dev 20 > 15
      ("b", 0.10), ("b", 0.20), ("b", 0.30), ("b", 0.40))
    val out = Quality.madOutliers(rows.toDF("grp", "v"), "grp", "v")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    out shouldBe Seq(
      ("a", 7L, 12L, 2L, 1L),
      ("b", 4L, 20L, 10L, 1L))
  }

  test("snapshotDiff classifies added/removed/changed/unchanged with exact totals") {
    val old = Seq((1L, "aa"), (2L, "bb"), (3L, "cc")).toDF("doc_id", "text")
    val neu = Seq((2L, "bb"), (3L, "cc2"), (4L, "dddd")).toDF("doc_id", "text")
    val out = Pipeline.snapshotDiff(old, neu, "doc_id", Seq("text"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    out("removed") shouldBe ((1L, 2L)) // doc 1, old chars
    out("unchanged") shouldBe ((1L, 2L)) // doc 2
    out("changed") shouldBe ((1L, 3L)) // doc 3, NEW chars
    out("added") shouldBe ((1L, 4L)) // doc 4
  }

  test("snapshotDiff: multi-column boundary shifts cannot alias (length-prefixed encoding)") {
    // ("ab","c") vs ("a","bc") concatenate identically — the length
    // prefix (2:ab1:c vs 1:a2:bc) must classify the row as changed
    val old = Seq((1L, "ab", "c")).toDF("doc_id", "t1", "t2")
    val neu = Seq((1L, "a", "bc")).toDF("doc_id", "t1", "t2")
    val out = Pipeline.snapshotDiff(old, neu, "doc_id", Seq("t1", "t2"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.get("changed") shouldBe Some(1L)
  }

  test("snapshotDiff: a null column value neither crashes nor aliases empty") {
    val old = Seq((1L, Option.empty[String]), (2L, Some(""))).toDF("doc_id", "text")
    val neu = Seq((1L, Some("")), (2L, Some(""))).toDF("doc_id", "text")
    val out = Pipeline.snapshotDiff(old, neu, "doc_id", Seq("text"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out("changed") shouldBe 1L // null -> "" is a change, not an alias
    out("unchanged") shouldBe 1L
  }

  test("chunkDocs: stride/overlap boundaries, full coverage, no redundant tail") {
    // 10 tokens, size 4, overlap 1 (stride 3): chunks at 0/3/6, all full
    val doc = (0 until 10).map(i => s"t$i").mkString(" ")
    val out = Pipeline.chunkDocs(Seq((1L, doc)).toDF("doc_id", "text"), 4, 1)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    out.toSeq shouldBe Seq((0L, 4L), (1L, 4L), (2L, 4L))
    // 2 tokens: one short chunk
    val short = Pipeline.chunkDocs(Seq((1L, "a b")).toDF("doc_id", "text"), 4, 1)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    short.toSeq shouldBe Seq((0L, 2L))
    // 4 tokens at size 4: a start at stride 3 would expose nothing beyond
    // the overlap -> exactly one chunk, no redundant tail
    val exact4 = Pipeline.chunkDocs(Seq((1L, "a b c d")).toDF("doc_id", "text"), 4, 1)
      .collect()
    exact4.length shouldBe 1
    // chunk hashes equal md5 of the sliced windows
    val h = Pipeline.chunkDocs(Seq((1L, doc)).toDF("doc_id", "text"), 4, 1)
      .select("chunk_hash").as[String].collect()
    val toks = doc.split(" ")
    h.toSeq shouldBe Seq(0, 3, 6).map(p =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(toks.slice(p, p + 4).mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
  }

  test("chunkDocs plans shuffle-free: tokenize-explode-slice in one stage") {
    val df = spark.range(0, 50).select(col("id").as("doc_id"),
      concat(lit("w"), col("id"), lit(" x y z a b c")).as("text"))
    val plan = Pipeline.chunkDocs(df, 4, 1).queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }

  // ------------------------------------------------- sketch rollups

  private def eventsDf: DataFrame = {
    // 20 days x 200 events, value = deterministic pseudo-random-ish double
    val rows = for (day <- 1 to 20; i <- 0 until 200) yield {
      val ts = java.sql.Timestamp.valueOf(f"2024-03-$day%02d 10:00:00")
      (ts, ((day * 193 + i * 7919) % 1000).toLong, ((day * 31 + i * 17) % 500) / 10.0)
    }
    rows.toDF("ts", "user_id", "value")
  }

  test("KLL rollup: merged-day n is exact and range quantiles hold their rank bound") {
    val sk = SketchRollup.dailyQuantileSketches(eventsDf, "ts", "value")
    sk.count() shouldBe 20L
    val est = SketchRollup.rangeQuantileEstimate(sk, "2024-03-03", "2024-03-13",
      Seq(0.5, 0.95)).collect().head
    val in = eventsDf.where(col("ts") >= lit("2024-03-03") && col("ts") < lit("2024-03-13"))
    est.getLong(0) shouldBe in.count() // n through the merge is deterministic
    val vals = in.select("value").as[Double].collect().sorted
    def rankOf(v: Double): Double = vals.count(_ <= v).toDouble / vals.length
    math.abs(rankOf(est.getDouble(1)) - 0.5) should be <= 0.03
    math.abs(rankOf(est.getDouble(2)) - 0.95) should be <= 0.03
  }

  test("theta rollup: retention and churn estimates match exact set ops in exact mode") {
    val sk = SketchRollup.dailyThetaSketches(eventsDf, "ts", "user_id")
    val est = SketchRollup.rangeRetentionEstimate(sk,
      "2024-03-01", "2024-03-06", "2024-03-10", "2024-03-15").collect().head
    def users(from: String, to: String): Set[Long] =
      eventsDf.where(col("ts") >= lit(from) && col("ts") < lit(to))
        .select("user_id").as[Long].collect().toSet
    val (a, b) = (users("2024-03-01", "2024-03-06"), users("2024-03-10", "2024-03-15"))
    // < 4096 distincts per range -> theta sketches hold every hash: exact
    // (theta_sketch_estimate returns a rounded LongType)
    est.getLong(0) shouldBe a.size.toLong
    est.getLong(1) shouldBe b.size.toLong
    est.getLong(2) shouldBe (a intersect b).size.toLong
    est.getLong(3) shouldBe (a diff b).size.toLong
  }

  test("top-k rollup: exact when m covers the keys; pruned tier keeps sound bounds and an honest certificate") {
    // two days, skewed keys: true range counts a=18, c=7, b=5, d=2
    val rows =
      Seq.fill(10)(("2024-03-01 10:00:00", "a")) ++ Seq.fill(5)(("2024-03-01 10:00:00", "b")) ++
        Seq.fill(3)(("2024-03-01 10:00:00", "c")) ++
        Seq.fill(8)(("2024-03-02 10:00:00", "a")) ++ Seq.fill(4)(("2024-03-02 10:00:00", "c")) ++
          Seq.fill(2)(("2024-03-02 10:00:00", "d"))
    val ev = rows.toDF("s", "key").select(col("s").cast("timestamp").as("ts"), col("key"))

    // m ≥ key cardinality: residuals 0, bounds collapse, everything guaranteed
    val exact = SketchRollup.rangeTopK(
      SketchRollup.dailyTopKCandidates(ev, "ts", "key", m = 10),
      "2024-03-01", "2024-03-03", k = 2)
      .as[(String, Long, Long, Boolean)].collect().toSeq
    exact shouldBe Seq(("a", 18L, 18L, true), ("c", 7L, 7L, true))

    // m = 2 prunes: day1 drops c(3) → residual 3, day2 drops d(2) → residual 2.
    // candidates merge to a=18 (both days), b=5 (ub 5+2), c=4 (ub 4+3);
    // top-2 by lower bound returns (a, b) — and the certificate says a is
    // provably top-k while b is NOT (c's upper bound 7 beats b's 5)
    val pruned = SketchRollup.rangeTopK(
      SketchRollup.dailyTopKCandidates(ev, "ts", "key", m = 2),
      "2024-03-01", "2024-03-03", k = 2)
      .as[(String, Long, Long, Boolean)].collect().toSeq
    pruned shouldBe Seq(("a", 18L, 18L, true), ("b", 5L, 7L, false))

    // k larger than the candidate set: the phantom-key bound (total
    // residual sum) still gates the certificate — every returned count is
    // a sound lower bound
    val wide = SketchRollup.rangeTopK(
      SketchRollup.dailyTopKCandidates(ev, "ts", "key", m = 2),
      "2024-03-01", "2024-03-03", k = 5)
      .as[(String, Long, Long, Boolean)].collect().toSeq
    wide.map(_._1) shouldBe Seq("a", "b", "c")
    // rival is the phantom key's ub = 3 + 2 = 5: a (18) and b (5) clear
    // it, c's lower bound 4 does not
    wide.map(_._4) shouldBe Seq(true, true, false)
    // lower/upper bounds bracket the true counts
    val truth = Map("a" -> 18L, "b" -> 5L, "c" -> 7L)
    wide.foreach { case (key, lb, ub, _) =>
      lb should be <= truth(key); truth(key) should be <= ub
    }
  }

  test("top-k count log: day-overlapping per-batch deltas re-sum to the direct summary, any order") {
    val ev = eventsDf.withColumn("key", (col("user_id") % 7).cast("string"))
    // two ingest batches SPLIT WITHIN DAYS (value threshold), so re-sum
    // across batches is genuinely exercised on shared (day, key) cells
    val b1 = ev.where(col("value") < 25.0)
    val b2 = ev.where(col("value") >= 25.0)
    def counts(df: DataFrame) = SketchRollup.dailyKeyCounts(df, "ts", "key")
    val direct = SketchRollup.dailyTopKCandidates(ev, "ts", "key", m = 3)
      .orderBy("day", "key").collect().toSeq
    Seq(counts(b1).unionByName(counts(b2)),
        counts(b2).unionByName(counts(b1))).foreach { log =>
      SketchRollup.candidatesFromCountLog(log, m = 3)
        .orderBy("day", "key").collect().toSeq shouldBe direct
    }
  }

  test("PSI drift: identical snapshots read 0.0 stable; a wholesale quality-mass move alarms major") {
    import graft.operators.Quality
    // high-quality docs: long, diverse, stopword-bearing; junk: one token
    val good = (0L to 39L).map(i => (i,
      s"the quick brown fox jumps over a lazy dog while many other words appear here number$i"))
    val junk = (100L to 139L).map(i => (i, s"spam$i"))
    val goodDf = good.toDF("doc_id", "text")
    val junkDf = junk.toDF("doc_id", "text")
    val same = Quality.psiDrift(goodDf, goodDf)
      .as[(Double, String)].collect().head
    same shouldBe ((0.0, "stable"))
    val moved = Quality.psiDrift(goodDf, junkDf)
      .as[(Double, String)].collect().head
    moved._1 should be > 0.25
    moved._2 shouldBe "major"
    // symmetry of the planted move: PSI(a,b) == PSI(b,a) for a full swap
    val back = Quality.psiDrift(junkDf, goodDf)
      .as[(Double, String)].collect().head
    back._1 shouldBe moved._1 +- 1e-9
  }

  test("chi-squared drift: hand contingency terms; a vanished category dominates; empty side refused") {
    def df(cats: String*) = cats.toSeq.toDF("category")
    // v1 {A:3, B:1}, v2 {A:1, B:1}: n1=4, n2=2, N=6
    Quality.chiSquareDrift(df("A", "A", "A", "B"), df("A", "B"), "category")
      .as[(String, Long, Long, Long)].collect().toSeq shouldBe Seq(
      // A: (18−16)²e6 div 96 + (6−8)²e6 div 48 = 41666 + 83333
      ("A", 3L, 1L, 124999L),
      // B: (6−8)²e6 div 48 + (6−4)²e6 div 24 = 83333 + 166666
      ("B", 1L, 1L, 249999L))
    // a category VANISHING from v2 contributes the dominant term —
    // the signal PSI needs Laplace smoothing to see finitely
    Quality.chiSquareDrift(df("A", "A", "C", "C"), df("A", "A"), "category")
      .as[(String, Long, Long, Long)].collect().toSeq shouldBe Seq(
      ("A", 2L, 2L, 499999L), ("C", 2L, 0L, 999999L))
    an[IllegalArgumentException] should be thrownBy
      Quality.chiSquareDrift(df("A"), spark.emptyDataset[String].toDF("category"), "category")
  }

  test("KS drift: exact integer gap, bucket-count invariance, degenerate cases") {
    import graft.operators.Quality
    def df(xs: Seq[Double]) = xs.map(Tuple1(_)).toDF("value")
    // hand case: a = {1,2,3,4}, b = {3,4,5,6}; largest ECDF gap is at
    // x=2: |2/4 - 0/4| = 0.5 → d_num = 2·4 - 0·4 = 8, ks = 500000
    val a = df(Seq(1, 2, 3, 4)); val b = df(Seq(3, 4, 5, 6))
    val got = Quality.ksDrift(a, b).as[(Long, Long, Long, Long)].collect().head
    got shouldBe ((4L, 4L, 8L, 500000L))
    // identical samples → zero everywhere
    Quality.ksDrift(a, a).as[(Long, Long, Long, Long)].collect()
      .head shouldBe ((4L, 4L, 0L, 0L))
    // fully disjoint ranges → D = 1 exactly
    Quality.ksDrift(df(Seq(1, 2)), df(Seq(10, 11)))
      .as[(Long, Long, Long, Long)].collect().head._4 shouldBe 1000000L
    // bucket assignment is value-invisible: 1 bucket (global window
    // degenerate) ≡ many buckets (every value its own bucket)
    val r1 = Quality.ksDrift(a, b, rangeBuckets = 1).collect().head
    val r64 = Quality.ksDrift(a, b, rangeBuckets = 64).collect().head
    r1 shouldBe r64
    // all-equal values (span 0) → single bucket, gap 0 for equal sides,
    // and asymmetric counts still exact: a = {5,5,5}, b = {5}
    Quality.ksDrift(df(Seq(5, 5, 5)), df(Seq(5.0)))
      .as[(Long, Long, Long, Long)].collect().head shouldBe ((3L, 1L, 0L, 0L))
  }

  test("FD check: branching determinants counted, null dep not a branch, null det its own group") {
    import graft.operators.Quality
    val rows = Seq(
      (1L, Some("a"), Some("x")), (2L, Some("a"), Some("x")),
      (3L, Some("b"), Some("x")), (4L, Some("b"), Some("y")), // b branches
      (5L, None, Some("z")), (6L, None, Some("w")),           // null det branches
      (7L, Some("c"), None), (8L, Some("c"), Some("q"))       // null dep ignored
    ).toDF("id", "cat", "fmt")
    val out = Quality.fdCheck(rows, Seq("cat" -> "fmt", "id" -> "cat"))
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    out shouldBe Seq(
      ("cat->fmt", 4L, 2L, 2L, 500000L), // dets a/b/null/c; b and null branch
      ("id->cat", 8L, 0L, 1L, 0L))       // a real key
    an[IllegalArgumentException] should be thrownBy
      Quality.fdCheck(rows, Seq("cat" -> "fmt", "cat" -> "fmt"))
  }

  test("Benford profile: leading-digit counts, literal expectations, zero rows for absent digits, " +
    "non-positives excluded") {
    import graft.operators.Quality
    // positives: digits 1×2 (1, 10), 2×2 (25, 2), 3/4/5/8/9 ×1; 0 and
    // negative excluded; 6 and 7 absent → must surface as 0-count rows
    val vals = Seq(1L, 10L, 25L, 300L, 41L, 5L, 9123L, 88L, 2L, 0L, -7L)
      .map(Tuple1(_)).toDF("v")
    val out = Quality.benfordProfile(vals, "v")
      .as[(Int, Long, Long, Long, Long)].collect().toSeq
    out.map(_._1) shouldBe (1 to 9)
    out.map(_._2) shouldBe Seq(2L, 2L, 1L, 1L, 1L, 0L, 0L, 1L, 1L)
    // n = 9: share for a 2-count digit = 222222 (floor), 1-count 111111
    out.head._3 shouldBe 222222L
    out(2)._3 shouldBe 111111L
    out(5)._3 shouldBe 0L
    // expectations are the literal micros table and sum to exactly 1e6
    out.map(_._4) shouldBe Quality.BenfordE6
    Quality.BenfordE6.sum shouldBe 1000000L
    // dev is the signed difference
    out.foreach(r => r._5 shouldBe r._3 - r._4)
    an[IllegalArgumentException] should be thrownBy
      Quality.benfordProfile(Seq(Tuple1(0L)).toDF("v"), "v")
  }
}
