package graft

import graft.operators.EventAnalytics
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Funnel specs: hand-computed step progressions — ordering enforcement
  * (a click BEFORE any view never qualifies), the anchor horizon, the
  * same-microsecond boundary rule, and the one-sort plan shape. The j9
  * entry additionally value-gates the whole chain against DuckDB's
  * layered-window recompute on the sf events.
  */
class EventAnalyticsSpec extends AnyFunSuite with Matchers with SparkSupport {
  import spark.implicits._

  private val Steps = Seq("view", "click", "purchase")

  private def ev(rows: (Long, String, String)*) =
    rows.map { case (u, t, ts) => (u, t, java.sql.Timestamp.valueOf(ts)) }
      .toDF("user_id", "event_type", "ts")

  private def run(df: org.apache.spark.sql.DataFrame,
                  horizon: Long = Long.MaxValue): Map[String, Long] =
    EventAnalytics.funnel(df, "user_id", "ts", "event_type", Steps, horizon)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap

  test("stickiness: hand-computed DAU/MAU on a gappy spine; zero day visible; empty window null") {
    val events = Seq(
      (1L, "view", "2024-01-01 10:00:00"), (2L, "view", "2024-01-01 11:00:00"),
      (2L, "view", "2024-01-02 10:00:00"), (2L, "view", "2024-01-02 12:00:00"),
      (3L, "view", "2024-01-04 10:00:00"))
      .map { case (u, t, ts) => (u, t, java.sql.Timestamp.valueOf(ts)) }
      .toDF("user_id", "event_type", "ts")
    val got = EventAnalytics.stickiness(events, windowDays = 2)
      .as[(String, Long, Long, Option[Long])].collect().toSeq
    got shouldBe Seq(
      ("2024-01-01", 2L, 2L, Some(1000000L)),
      ("2024-01-02", 1L, 2L, Some(500000L)), // trailing window still sees both users
      ("2024-01-03", 0L, 1L, Some(0L)),      // zero-event day visible, not dropped
      ("2024-01-04", 1L, 1L, Some(1000000L)))
    // window 1: the empty day has an EMPTY window → null, never 0
    EventAnalytics.stickiness(events, windowDays = 1)
      .as[(String, Long, Long, Option[Long])].collect()
      .find(_._1 == "2024-01-03").get shouldBe (("2024-01-03", 0L, 0L, None))
  }

  test("strict ordering: out-of-order steps never qualify") {
    val df = ev(
      // user 1 completes in order
      (1L, "view", "2024-01-01 10:00:00"), (1L, "click", "2024-01-01 11:00:00"),
      (1L, "purchase", "2024-01-01 12:00:00"),
      // user 2: click precedes every view — reaches step 1 only
      (2L, "click", "2024-01-01 09:00:00"), (2L, "view", "2024-01-01 10:00:00"),
      (2L, "purchase", "2024-01-01 11:00:00"),
      // user 3: purchase precedes the (valid) view→click — stops at click
      (3L, "view", "2024-01-01 08:00:00"), (3L, "purchase", "2024-01-01 08:30:00"),
      (3L, "click", "2024-01-01 09:00:00"))
    run(df) shouldBe Map("view" -> 3L, "click" -> 2L, "purchase" -> 1L)
  }

  test("the horizon anchors at the FIRST view, not the qualifying step") {
    val df = ev(
      (1L, "view", "2024-01-01 00:00:00"),
      (1L, "click", "2024-01-01 01:00:00"),
      (1L, "purchase", "2024-01-01 03:30:00")) // 3.5h after anchor
    run(df, horizon = 4L * 3600 * 1000000) shouldBe
      Map("view" -> 1L, "click" -> 1L, "purchase" -> 1L)
    // 3h horizon: purchase is 3.5h after the anchor — click still in
    run(df, horizon = 3L * 3600 * 1000000) shouldBe
      Map("view" -> 1L, "click" -> 1L, "purchase" -> 0L)
  }

  test("same-microsecond boundary: an equal-timestamp next step qualifies") {
    val df = ev(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 10:00:00"), // same instant as the view
      (1L, "purchase", "2024-01-01 10:00:00"))
    run(df) shouldBe Map("view" -> 1L, "click" -> 1L, "purchase" -> 1L)
  }

  test("frac_of_prev: exact long division, null at step 1") {
    val df = ev(
      (1L, "view", "2024-01-01 10:00:00"), (1L, "click", "2024-01-01 11:00:00"),
      (2L, "view", "2024-01-01 10:00:00"), (2L, "click", "2024-01-01 11:00:00"),
      (3L, "view", "2024-01-01 10:00:00"), (3L, "click", "2024-01-01 11:00:00"),
      (4L, "view", "2024-01-01 10:00:00"),
      (1L, "purchase", "2024-01-01 12:00:00"))
    val out = EventAnalytics.funnel(df, "user_id", "ts", "event_type", Steps)
      .collect().map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Double])))
    out(0) shouldBe ((1L, None))
    out(1) shouldBe ((2L, Some(0.75)))      // 3/4
    out(2) shouldBe ((3L, Some(0.333333)))  // 1/3
  }

  test("retentionCohorts: multi-cohort grid with exact counts and fractions") {
    // ISO weeks: 2024-01-01 is a Monday. u1,u2 cohort W1; u3 cohort W2
    val df = ev(
      (1L, "view", "2024-01-01 10:00:00"), (1L, "view", "2024-01-08 10:00:00"),
      (1L, "view", "2024-01-22 10:00:00"), // offsets 0,1,3
      (2L, "view", "2024-01-03 10:00:00"), // offset 0 only
      (3L, "view", "2024-01-10 10:00:00"), (3L, "view", "2024-01-15 10:00:00"))
    val out = EventAnalytics.retentionCohorts(df, "user_id", "ts", maxOffsetWeeks = 4)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    out(("2024-01-01", 0L)) shouldBe ((2L, 1.0))
    out(("2024-01-01", 1L)) shouldBe ((1L, 0.5))
    out(("2024-01-01", 3L)) shouldBe ((1L, 0.5))
    out.get(("2024-01-01", 2L)) shouldBe None // no one active in week 3
    out(("2024-01-08", 0L)) shouldBe ((1L, 1.0))
    out(("2024-01-08", 1L)) shouldBe ((1L, 1.0))
    out.size shouldBe 5
  }

  test("plan: the whole qualified-step chain rides ONE user exchange and one sort") {
    val df = ev((1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 11:00:00"), (1L, "purchase", "2024-01-01 12:00:00"))
    val plan = EventAnalytics.funnel(df, "user_id", "ts", "event_type", Steps)
      .queryExecution.executedPlan.toString
    "Exchange hashpartitioning\\(__u".r.findAllIn(plan).size shouldBe 1
    "Sort \\[__u".r.findAllIn(plan).size shouldBe 1 // stacked windows share it
  }

  test("funnelLatency: hand-computed transition gaps; only converting users counted") {
    val df = ev(
      // user 1: view→click 1h, click→purchase 2h
      (1L, "view", "2024-01-01 10:00:00"), (1L, "click", "2024-01-01 11:00:00"),
      (1L, "purchase", "2024-01-01 13:00:00"),
      // user 2: view→click 3h, never purchases
      (2L, "view", "2024-01-01 08:00:00"), (2L, "click", "2024-01-01 11:00:00"),
      // user 3: never clicks — contributes to no transition
      (3L, "view", "2024-01-01 09:00:00"))
    val out = EventAnalytics.funnelLatency(df, "user_id", "ts", "event_type",
        Steps, exactPercentiles = true)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    val h = 3600e6 // microseconds per hour
    out shouldBe Seq(
      (2L, "click", 2L, 2 * h, 2.8 * h), // p50 of {1h,3h} = 2h; p90 = 2.8h
      (3L, "purchase", 1L, 2 * h, 2 * h))
  }

  test("funnelLatency: the approx twin agrees at gate scale and shares the plan shape") {
    val df = ev((1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 11:00:00"), (1L, "purchase", "2024-01-01 13:00:00"),
      (2L, "view", "2024-01-01 08:00:00"), (2L, "click", "2024-01-01 11:00:00"))
    def run(exact: Boolean) =
      EventAnalytics.funnelLatency(df, "user_id", "ts", "event_type", Steps,
        exactPercentiles = exact)
    // the sketch twin counts identically; its percentiles are OBSERVED
    // latencies (approx_percentile returns a data value where the exact
    // form interpolates), so equality is on counts and membership
    val exact = run(true).collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    val approx = run(false).collect()
    approx.map(r => (r.getLong(0), r.getLong(2))).toSeq shouldBe exact
    val observed = Set(3600e6, 3 * 3600e6, 2 * 3600e6) // 1h, 3h; purchase 2h
    approx.foreach { r =>
      observed should contain(r.getDouble(3))
      observed should contain(r.getDouble(4))
    }
    // latency rides the SAME single user exchange + sort as the funnel
    val plan = run(false).queryExecution.executedPlan.toString
    "Exchange hashpartitioning\\(__u".r.findAllIn(plan).size shouldBe 1
    "Sort \\[__u".r.findAllIn(plan).size shouldBe 1
  }

  test("multi-touch attribution: U-shape credits, exact 1e6 per conversion, remainder on last touch, window excludes") {
    def mev(rows: (Long, Long, String, String)*) =
      rows.map { case (id, u, t, ts) =>
        (id, u, t, java.sql.Timestamp.valueOf(ts)) }
        .toDF("event_id", "user_id", "event_type", "ts")
    val df = mev(
      // user 1: one click → 100%
      (10L, 1L, "click", "2024-01-01 10:00:00"),
      (11L, 1L, "purchase", "2024-01-01 10:30:00"),
      // user 2: two clicks → 50/50
      (20L, 2L, "click", "2024-01-01 10:00:00"),
      (21L, 2L, "click", "2024-01-01 10:10:00"),
      (22L, 2L, "purchase", "2024-01-01 10:30:00"),
      // user 3: five clicks → 400k, 66666, 66666, 66666, 400k + 2
      (30L, 3L, "click", "2024-01-01 10:00:00"),
      (31L, 3L, "click", "2024-01-01 10:05:00"),
      (32L, 3L, "click", "2024-01-01 10:10:00"),
      (33L, 3L, "click", "2024-01-01 10:15:00"),
      (34L, 3L, "click", "2024-01-01 10:20:00"),
      (35L, 3L, "purchase", "2024-01-01 10:30:00"),
      // user 4: click OUTSIDE the 1h lookback → conversion has no touches
      (40L, 4L, "click", "2024-01-01 08:00:00"),
      (41L, 4L, "purchase", "2024-01-01 10:30:00"))
    val out = EventAnalytics.multiTouchAttribution(df, lookbackMicros = 3600000000L)
      .orderBy("purchase_id", "pos")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    out.filter(_._1 == 11L).map(_._5) shouldBe Seq(1000000L)
    out.filter(_._1 == 22L).map(_._5) shouldBe Seq(500000L, 500000L)
    out.filter(_._1 == 35L).map(_._5) shouldBe
      Seq(400000L, 66666L, 66666L, 66666L, 400002L)
    // exact million per conversion — the audit invariant
    out.groupBy(_._1).values.foreach(_.map(_._5).sum shouldBe 1000000L)
    // the out-of-window conversion credits nothing
    out.exists(_._1 == 41L) shouldBe false
  }

  test("property: multi-touch attribution equals a driver-side reference on seeded random timelines") {
    val rnd = new scala.util.Random(41)
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = (0 until 300).map { i =>
      val t = if (rnd.nextInt(4) == 0) "purchase" else "click"
      (i.toLong, (rnd.nextInt(12) + 1).toLong, t,
        new java.sql.Timestamp(base + rnd.nextInt(4 * 3600) * 1000L))
    }
    val df = rows.toDF("event_id", "user_id", "event_type", "ts")
    val look = 1800L * 1000000 // 30 min
    val got = EventAnalytics.multiTouchAttribution(df, lookbackMicros = look)
      .orderBy("purchase_id", "pos")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val clicks = rows.filter(_._3 == "click")
    val expect = rows.filter(_._3 == "purchase").sortBy(_._1).flatMap { p =>
      val pUs = p._4.getTime * 1000
      val touches = clicks
        .filter(c => c._2 == p._2 && c._4.getTime * 1000 <= pUs &&
          c._4.getTime * 1000 > pUs - look)
        .sortBy(c => (c._4.getTime, c._1))
      val n = touches.size.toLong
      touches.zipWithIndex.map { case (c, i) =>
        val pos = i + 1L
        val credit =
          if (n == 1) 1000000L
          else if (n == 2) 500000L
          else if (pos == 1) 400000L
          else if (pos == n) 400000L + 200000L % (n - 2)
          else (200000L - 200000L % (n - 2)) / (n - 2)
        (p._1, c._1, pos, n, credit)
      }
    }
    got shouldBe expect
    // the audit invariant holds on every random conversion
    got.groupBy(_._1).values.foreach(_.map(_._5).sum shouldBe 1000000L)
  }

  test("item neighbors: perfect co-view pair is mutual top-1 at cos 1.0; bots capped out; repeat views collapse") {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    // users 1..4 each view items 1 AND 2 (user 1 views item 1 twice —
    // set semantics); user 5 views items 2 and 3; user 99 is a bot
    // viewing everything and must not inflate any count
    val rows =
      (1L to 4L).flatMap(u => Seq((u, 1), (u, 1), (u, 2))) ++
        Seq((5L, 2), (5L, 3)) ++
        (1 to 10).map(i => (99L, i))
    val df = rows.zipWithIndex.map { case ((u, item), i) =>
      (i.toLong, u, "view", s"""{"k": $item}""", ts)
    }.toDF("event_id", "user_id", "event_type", "props", "ts")
    val out = EventAnalytics.itemNeighbors(df,
        regexp_extract(col("props"), "(\\d+)", 1), k = 2, maxUserItems = 5)
      .orderBy("item", "rank")
      .as[(Int, Long, Int, Long, Double)].collect().toSeq
    // |u(1)|=4, |u(2)|=5, |u(3)|=1 (bot excluded everywhere)
    val top1 = out.filter(r => r._1 == 1 && r._2 == 1L).head
    top1._3 shouldBe 2 // item 1's best neighbor is item 2
    top1._4 shouldBe 4L // shared users exclude the bot AND dedupe repeats
    top1._5 shouldBe (4.0 / math.sqrt(4.0 * 5.0) +- 1e-6)
    val item3 = out.filter(r => r._1 == 3 && r._2 == 1L).head
    item3._3 shouldBe 2 // item 3 co-viewed only with 2 (via user 5)
    item3._5 shouldBe (1.0 / math.sqrt(1.0 * 5.0) +- 1e-6)
  }

  test("property: item neighbors equal a driver-side reference on seeded random feedback") {
    val rnd = new scala.util.Random(31)
    val rows = (0 until 400).map { i =>
      (i.toLong, (rnd.nextInt(25) + 1).toLong, "view",
        s"""{"k": ${rnd.nextInt(12)}}""",
        java.sql.Timestamp.valueOf("2024-01-01 10:00:00"))
    }
    val df = rows.toDF("event_id", "user_id", "event_type", "props", "ts")
    val k = 3
    val cap = 6
    val got = EventAnalytics.itemNeighbors(df,
        regexp_extract(col("props"), "(\\d+)", 1), k = k, maxUserItems = cap)
      .orderBy("item", "rank")
      .as[(Int, Long, Int, Long, Double)].collect().toSeq
    // reference: plain Scala sets
    val ui = rows.map(r => (r._2, r._4.replaceAll("\\D", "").toInt)).distinct
    val keep = ui.groupBy(_._1).filter(_._2.size <= cap).keySet
    val byItem = ui.filter(r => keep(r._1)).groupBy(_._2)
      .map { case (it, xs) => it -> xs.map(_._1).toSet }
    val expect = byItem.keys.toSeq.sorted.flatMap { a =>
      val scored = byItem.keys.toSeq.filter(_ != a).flatMap { b =>
        val shared = (byItem(a) & byItem(b)).size
        if (shared == 0) None
        else Some((b, shared.toLong,
          BigDecimal(shared / math.sqrt(byItem(a).size.toDouble * byItem(b).size))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
      scored.sortBy { case (b, _, c) => (-c, b) }.take(k).zipWithIndex
        .map { case ((b, n, c), i) => (a, (i + 1).toLong, b, n, c) }
    }
    got shouldBe expect
  }

  test("transition matrix: adjacency per user, event_id tiebreak, floor micros") {
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    // user 1: view→click→view (2 transitions); user 2: view→view twice;
    // user 3: a same-microsecond tie — event_id order decides (5 before 6,
    // so click→view, NOT view→click); single-event user 4 contributes none
    val rows = Seq(
      (1L, 1L, "view", t("2024-01-01 10:00:00")),
      (2L, 1L, "click", t("2024-01-01 10:00:01")),
      (3L, 1L, "view", t("2024-01-01 10:00:02")),
      (4L, 2L, "view", t("2024-01-01 10:00:00")),
      (7L, 2L, "view", t("2024-01-01 10:00:05")),
      (9L, 2L, "view", t("2024-01-01 10:00:06")),
      (5L, 3L, "click", t("2024-01-01 10:00:00")),
      (6L, 3L, "view", t("2024-01-01 10:00:00")),
      (8L, 4L, "purchase", t("2024-01-01 10:00:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = EventAnalytics.transitionMatrix(rows)
      .as[(String, String, Long, Long)].collect().toSeq
    // src=view rows: view→click 1, view→view 2 → n_src 3; floor division
    got shouldBe Seq(
      ("click", "view", 2L, 1000000L),
      ("view", "click", 1L, 333333L),
      ("view", "view", 2L, 666666L))
  }

  test("top paths: strict gap boundary, prefix cap, count ranking with path ties") {
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val gap = 1800000000L // 30 min
    // user 1: two events EXACTLY 30 min apart — same session (strict >);
    // then one 30min+1us later — new session. user 2: a 15-event session
    // that must truncate to the 12-step prefix. users 3,4: identical
    // "view>click" sessions → count 2 ranks above singletons
    val rows =
      Seq((1L, 1L, "view", t("2024-01-01 10:00:00")),
        (2L, 1L, "click", t("2024-01-01 10:30:00")),
        (3L, 1L, "error", Timestamp.from(
          t("2024-01-01 11:00:00").toInstant.plusNanos(1000)))) ++
        (0 until 15).map(i =>
          (10L + i, 2L, "view", t(f"2024-01-01 10:${i}%02d:00"))) ++
        Seq((40L, 3L, "view", t("2024-01-01 10:00:00")),
          (41L, 3L, "click", t("2024-01-01 10:01:00")),
          (42L, 4L, "view", t("2024-01-01 10:00:00")),
          (43L, 4L, "click", t("2024-01-01 10:01:00")))
    val got = EventAnalytics.topPaths(
        rows.toDF("event_id", "user_id", "event_type", "ts"),
        gapMicros = gap, k = 10, maxLen = 12)
      .as[(String, Long)].collect().toSeq
    got.head shouldBe (("view>click", 3L)) // user 1's first session + users 3,4
    got should contain(("error", 1L)) // user 1's second session
    got should contain((Seq.fill(12)("view").mkString(">"), 1L)) // capped at 12
    got.map(_._1).foreach(p => p.split(">").length should be <= 12)
  }

  test("A/B readout: exact tallies, hand-computed z, degenerate variance reports null") {
    import java.sql.Timestamp
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    // Knuth split of user_id by an odd multiplier mod 2 = user parity:
    // even ids → variant 0, odd ids → variant 1. Users 0..9; converters
    // (>= 2 purchases): evens {0, 2, 4} (3/5), odds {1} (1/5)
    val converters = Set(0L, 2L, 4L, 1L)
    val rows = (0L to 9L).flatMap { u =>
      val n = if (converters(u)) 2 else 1
      (1 to n).map(i => (u * 10 + i, u, "purchase", t0)) :+
        ((u * 10 + 9, u, "view", t0))
    }
    val got = EventAnalytics.abReadout(
        rows.toDF("event_id", "user_id", "event_type", "ts"), minConv = 2)
      .as[(Long, Long, Long, Long, Long, Long, Option[Double], Option[Boolean])]
      .collect().head
    got._1 shouldBe 5L; got._2 shouldBe 3L // n_a, k_a
    got._3 shouldBe 5L; got._4 shouldBe 1L // n_b, k_b
    got._5 shouldBe 600000L; got._6 shouldBe 200000L
    val pp = 4.0 / 10
    val zRef = (3.0 / 5 - 1.0 / 5) / math.sqrt(pp * (1 - pp) * (1.0 / 5 + 1.0 / 5))
    got._7.get shouldBe BigDecimal(zRef)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    got._8.get shouldBe (math.abs(got._7.get) > 1.96)
    // degenerate: every user converts → pooled variance exactly 0 →
    // z and the flag are null, never an ANSI divide-by-zero
    val all = (0L to 9L).flatMap(u =>
      Seq((u * 10 + 1, u, "purchase", t0), (u * 10 + 2, u, "purchase", t0)))
    val deg = EventAnalytics.abReadout(
        all.toDF("event_id", "user_id", "event_type", "ts"), minConv = 2)
      .as[(Long, Long, Long, Long, Long, Long, Option[Double], Option[Boolean])]
      .collect().head
    deg._7 shouldBe None
    deg._8 shouldBe None
  }

  test("bounce rate: entry-type attribution, strict gap boundary, exact micros") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      // user 1: a 3-event session ENTERING on view (no bounce), then after
      // a >30-min gap a lone click session (bounce)
      (1L, 1L, "view", t("2024-01-01 10:00:00")),
      (1L, 2L, "click", t("2024-01-01 10:10:00")),
      (1L, 3L, "purchase", t("2024-01-01 10:20:00")),
      (1L, 4L, "click", t("2024-01-01 12:00:00")),
      // user 2: events exactly 30 min apart stay ONE session (strict >)
      (2L, 5L, "view", t("2024-01-01 09:00:00")),
      (2L, 6L, "view", t("2024-01-01 09:30:00")),
      // user 3: lone view (bounce)
      (3L, 7L, "view", t("2024-01-01 08:00:00")))
      .toDF("user_id", "event_id", "event_type", "ts")
    val out = EventAnalytics.bounceRate(rows)
      .as[(String, Long, Long, Long)].collect().toSeq
    out shouldBe Seq(
      ("click", 1L, 1L, 1000000L), // user 1's second session
      ("view", 3L, 1L, 333333L)) // u1 s1 (no bounce), u2 (boundary-joined), u3 (bounce)
  }

  test("dwell times: session boundary strict, final events drop, order statistics exact") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      // user 1: views dwell 10s, 20s, 30s, 40s, then a 2h gap (NOT a
      // dwell), then a click dwelling exactly 1800s (kept: <= boundary),
      // then a session-final purchase (no dwell)
      (1L, 10L, "view", t("2024-01-01 10:00:00")),
      (1L, 11L, "view", t("2024-01-01 10:00:10")),
      (1L, 12L, "view", t("2024-01-01 10:00:30")),
      (1L, 13L, "view", t("2024-01-01 10:01:00")),
      (1L, 14L, "view", t("2024-01-01 10:01:40")),
      (1L, 15L, "click", t("2024-01-01 12:30:00")),
      (1L, 16L, "purchase", t("2024-01-01 13:00:00")),
      // user 2: a lone event — nothing follows, contributes nothing
      (2L, 20L, "view", t("2024-01-01 09:00:00")))
      .toDF("user_id", "event_id", "event_type", "ts")
    val out = EventAnalytics.dwellTimes(rows)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // view dwells (µs): 10,20,30,40 s + the 2h gap DROPPED → n=4,
    // lower med = rank (5)DIV 2 = 2nd = 20s, p90 = rank (45)DIV 10 = 4th
    // = 40s; click dwell exactly 1800s kept
    out shouldBe Seq(
      ("click", 1L, 1800000000L, 1800000000L, 1800000000L),
      ("view", 4L, 20000000L, 40000000L, 40000000L))
  }

  test("exit actions: anchored 24h conversion window, pre-view purchases don't convert, last-event argmax") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      // u1 converts inside the window → excluded from the report
      (1L, 10L, "view", t("2024-01-01 10:00:00")),
      (1L, 11L, "purchase", t("2024-01-01 11:00:00")),
      // u2's only purchase is 30h after the first view — outside the
      // window, so u2 is a NON-converter whose last act is that purchase
      (2L, 20L, "view", t("2024-01-01 10:00:00")),
      (2L, 21L, "purchase", t("2024-01-02 16:00:00")),
      // u3 just clicks away
      (3L, 30L, "view", t("2024-01-01 10:00:00")),
      (3L, 31L, "click", t("2024-01-01 11:00:00")),
      // u4 never views — not in the population at all
      (4L, 40L, "purchase", t("2024-01-01 10:00:00")),
      // u5's purchase PREDATES the first view (no conversion from it);
      // exits on an error
      (5L, 50L, "purchase", t("2024-01-01 09:00:00")),
      (5L, 51L, "view", t("2024-01-01 10:00:00")),
      (5L, 52L, "error", t("2024-01-01 12:00:00")))
      .toDF("user_id", "event_id", "event_type", "ts")
    val got = EventAnalytics.exitActions(rows)
      .as[(String, Long, Long)].collect().toSeq
    got shouldBe Seq( // three n=1 exits, ties by type asc; 1e6 DIV 3 shares
      ("click", 1L, 333333L), ("error", 1L, 333333L), ("purchase", 1L, 333333L))
  }

  test("session concurrency: hour-spanning sessions count in every touched hour, gap splits") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      // u1 session A inside hour 10; session B spans hours 11→12
      (1L, 10L, "view", t("2024-01-01 10:10:00")),
      (1L, 11L, "view", t("2024-01-01 10:30:00")),
      (1L, 12L, "view", t("2024-01-01 11:50:00")),
      (1L, 13L, "view", t("2024-01-01 12:10:00")),
      // u2: a single-event session in hour 10
      (2L, 20L, "view", t("2024-01-01 10:05:00")))
      .toDF("user_id", "event_id", "event_type", "ts")
    val got = EventAnalytics.sessionConcurrency(rows)
      .as[(java.sql.Timestamp, Long)].collect().toSeq
    got shouldBe Seq(
      (t("2024-01-01 10:00:00"), 2L),
      (t("2024-01-01 11:00:00"), 1L),
      (t("2024-01-01 12:00:00"), 1L))
  }

  test("time to convert: first-view anchor, pre-view purchases ignored, weekly cohorts, exact ranks") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      // u1: clean 1h conversion (cohort Mon 2024-01-01)
      (1L, 10L, "view", t("2024-01-03 10:00:00")),
      (1L, 11L, "purchase", t("2024-01-03 11:00:00")),
      // u2: a purchase BEFORE the first view is not a conversion from it;
      // the 2h-later one is (the anchor rule)
      (2L, 20L, "purchase", t("2024-01-03 09:00:00")),
      (2L, 21L, "view", t("2024-01-03 10:00:00")),
      (2L, 22L, "purchase", t("2024-01-03 12:00:00")),
      // u3 never buys, u4 never views — both drop
      (3L, 30L, "view", t("2024-01-03 10:00:00")),
      (4L, 40L, "purchase", t("2024-01-03 10:00:00")),
      // u5: second cohort (Mon 2024-01-08), 30-min conversion
      (5L, 50L, "view", t("2024-01-10 10:00:00")),
      (5L, 51L, "purchase", t("2024-01-10 10:30:00")))
      .toDF("user_id", "event_id", "event_type", "ts")
    val out = EventAnalytics.timeToConvert(rows)
      .as[(String, Long, Long, Long)].collect().toSeq
    // cohort 1: lags {3600s (u1), 7200s (u2)} → n 2, med rank 1 = 3600s,
    // p90 rank 2 = 7200s; cohort 2: the single 1800s conversion
    out shouldBe Seq(
      ("2024-01-01", 2L, 3600000000L, 7200000000L),
      ("2024-01-08", 1L, 1800000000L, 1800000000L))
  }
}
