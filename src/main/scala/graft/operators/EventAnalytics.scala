package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch event-SEQUENCE analytics over the events fact — the
  * product-analytics family (funnels, conversion windows) whose streaming
  * siblings live in [[graft.streaming.EventStream]].
  */
object EventAnalytics {

  /** Ordered FUNNEL analysis: how many users progress through the step
    * sequence `steps` (view → click → purchase …) in order, with every
    * step landing within `horizonMicros` of the user's funnel ANCHOR (the
    * earliest step-1 event). A step-k event qualifies iff some qualified
    * step-(k−1) event precedes it at-or-before its timestamp — strictly
    * value-based (timestamp comparisons, never row-order), so
    * same-microsecond events resolve deterministically: within a
    * timestamp tie earlier steps sort first, which only ever ADMITS the
    * borderline event. Output one row per step:
    * `(step, event_type, n_users, frac_of_prev)` — exact user counts and
    * the step-over-step conversion fraction (null for step 1).
    *
    * Plan shape at 100 TB: the irrelevant event types are filtered at the
    * scan (pushed predicate), then ONE shuffle on the user key and ONE
    * in-partition sort serve the whole chain — each step's qualified
    * running minimum is a cumulative window over the SAME (user; ts,
    * step-rank) ordering (stacked Window operators reuse the sort, the
    * j6/j8 discipline), the per-user collapse is a map-side-combining
    * aggregate, and the final fraction window runs over |steps| rows.
    * Nothing is quadratic; sequential-scan funnel engines do exactly this
    * one ordered pass per user.
    */
  /** The shared qualification chain behind [[funnel]] and
    * [[funnelLatency]]: one row per user with `q0..q(n-1)` — the
    * microsecond timestamp of the user's earliest QUALIFIED event per
    * step (null where the user never reached the step). ONE shuffle on
    * the user key and ONE in-partition sort serve the whole chain.
    */
  private def qualifiedPerUser(events: DataFrame, userCol: String, tsCol: String,
                               typeCol: String, steps: Seq[String],
                               horizonMicros: Long): DataFrame = {
    require(steps.size >= 2, s"a funnel needs at least 2 steps: $steps")
    require(steps.distinct.size == steps.size, s"duplicate funnel steps: $steps")
    require(horizonMicros > 0, s"horizonMicros must be positive: $horizonMicros")
    val typeRank = steps.zipWithIndex.foldLeft(lit(steps.size)) {
      case (acc, (t, i)) => when(col("__t") === t, i).otherwise(acc)
    }
    val w = Window.partitionBy("__u").orderBy(col("__us"), col("__tr"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var df = events.where(col(typeCol).isin(steps: _*))
      .select(col(userCol).as("__u"), unix_micros(col(tsCol)).as("__us"),
        col(typeCol).as("__t"))
      .withColumn("__tr", typeRank)
      .withColumn("__q0", min(when(col("__t") === steps.head, col("__us"))).over(w))
    for (i <- 1 until steps.size) {
      val prev = col(s"__q${i - 1}")
      val qual = col("__t") === steps(i) && prev.isNotNull &&
        col("__us") >= prev && col("__us") - col("__q0") <= horizonMicros
      df = df.withColumn(s"__q$i", min(when(qual, col("__us"))).over(w))
    }
    df.groupBy("__u")
      .agg(min(col("__q0")).as("q0"),
        (1 until steps.size).map(i => min(col(s"__q$i")).as(s"q$i")): _*)
  }

  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String],
             horizonMicros: Long = Long.MaxValue): DataFrame = {
    val perUser = qualifiedPerUser(events, userCol, tsCol, typeCol, steps,
      horizonMicros)
    val counts = perUser.agg(
      sum(when(col("q0").isNotNull, 1L).otherwise(0L)).as("n0"),
      (1 until steps.size).map(i =>
        sum(when(col(s"q$i").isNotNull, 1L).otherwise(0L)).as(s"n$i")): _*)
    // one struct per step exploded from the single counts row — a
    // union-of-selects would re-execute the whole chain once per step
    val stepStructs = array(steps.zipWithIndex.map { case (t, i) =>
      struct(lit(i + 1L).as("step"), lit(t).as("event_type"),
        col(s"n$i").as("n_users"))
    }: _*)
    val long = counts.select(explode(stepStructs).as("s"))
      .select(col("s.step").as("step"), col("s.event_type").as("event_type"),
        col("s.n_users").as("n_users"))
    val wStep = Window.orderBy("step")
    long
      .withColumn("frac_of_prev",
        round(col("n_users") / lag(col("n_users"), 1).over(wStep), 6))
      .orderBy("step")
  }

  /** Funnel CONVERSION-LATENCY distributions — the second half of what
    * product analytics asks the funnel for: per step transition
    * (k−1 → k), how LONG converting users took, as
    * `(step, event_type, n_converted, p50_us, p90_us)` over the
    * microsecond gaps `q_k − q_(k−1)` of users who reached step k. Rides
    * [[funnel]]'s single user shuffle + sort (the same
    * [[qualifiedPerUser]] chain); per-user rows then explode to
    * |converted users| × |transitions| slim (step, lat) rows feeding one
    * map-side-combining aggregate over |steps| groups.
    *
    * Percentiles follow the t14/c4 exact/sketch twin discipline:
    * `exactPercentiles = true` computes the exact interpolated
    * percentile (Spark `percentile` = DuckDB `quantile_cont`, the
    * value-checkable gate form — its state buffers the distinct latency
    * values); the default is the bounded-memory `approx_percentile`
    * KLL-style sketch, the at-scale form. Latency values are exact long
    * microsecond differences either way; the only floating step is the
    * percentile interpolation itself.
    */
  def funnelLatency(events: DataFrame, userCol: String, tsCol: String,
                    typeCol: String, steps: Seq[String],
                    horizonMicros: Long = Long.MaxValue,
                    exactPercentiles: Boolean = false): DataFrame = {
    val perUser = qualifiedPerUser(events, userCol, tsCol, typeCol, steps,
      horizonMicros)
    val transitions = array((1 until steps.size).map(i =>
      struct(lit(i + 1L).as("step"), lit(steps(i)).as("event_type"),
        (col(s"q$i") - col(s"q${i - 1}")).as("lat"))): _*)
    val lat = perUser.select(explode(transitions).as("s"))
      .select(col("s.step").as("step"), col("s.event_type").as("event_type"),
        col("s.lat").as("lat"))
      .where(col("lat").isNotNull)
    def pct(q: Double) =
      if (exactPercentiles) expr(s"percentile(lat, $q)")
      else expr(s"approx_percentile(lat, $q, 10000)").cast("double")
    lat.groupBy("step", "event_type")
      .agg(count(lit(1)).as("n_converted"),
        round(pct(0.5), 4).as("p50_us"),
        round(pct(0.9), 4).as("p90_us"))
      .orderBy("step")
  }

  /** EXACT retention-cohort matrix — the classic product-analytics grid:
    * users cohorted by FIRST-SEEN ISO week, one row per
    * `(cohort_week, offset_weeks)` with the exact distinct active users
    * and their fraction of the cohort. The exact tier beside the
    * theta-sketch retention rollup ([[SketchRollup]], x18): sketches
    * answer ad-hoc ranges without rescanning, this produces the full
    * audited grid — the t12/c1 exact/sketch twin discipline at the
    * analytics level. `frac_of_cohort` divides two exact longs once
    * (engine-identical); offsets are integer week arithmetic on
    * week-truncated dates, so no timezone/rounding drift exists.
    *
    * At 100 TB: events collapse to DISTINCT (user, week) rows in one
    * map-side-combining pass; first-seen is a second aggregate of THAT
    * (user-keyed, co-partitioned with the join back); the matrix
    * aggregate and the per-cohort window both run over
    * |cohorts| × |offsets| metadata — the only corpus-scale costs are
    * the two user-keyed shuffles.
    */
  def retentionCohorts(events: DataFrame, userCol: String, tsCol: String,
                       maxOffsetWeeks: Int = 4): DataFrame = {
    require(maxOffsetWeeks >= 0, s"maxOffsetWeeks must be >= 0: $maxOffsetWeeks")
    val active = events.select(col(userCol).as("__u"),
        to_date(date_trunc("week", col(tsCol))).as("active_week"))
      .distinct()
    val firstSeen = active.groupBy("__u").agg(min("active_week").as("cohort_week"))
    val w = Window.partitionBy("cohort_week")
    active.join(firstSeen, "__u")
      .withColumn("offset_weeks",
        (datediff(col("active_week"), col("cohort_week")) / 7).cast("long"))
      .where(col("offset_weeks") <= maxOffsetWeeks)
      .groupBy("cohort_week", "offset_weeks")
      .agg(countDistinct(col("__u")).as("n_active"))
      .withColumn("cohort_size",
        max(when(col("offset_weeks") === 0, col("n_active"))).over(w))
      .select(col("cohort_week").cast("string").as("cohort_week"),
        col("offset_weeks"), col("n_active"),
        round(col("n_active") / col("cohort_size"), 6).as("frac_of_cohort"))
      .orderBy("cohort_week", "offset_weeks")
  }

  /** U-SHAPED (position-based) MULTI-TOUCH attribution — the credit model
    * beside e7's last-touch: every conversion splits its credit across
    * ALL touchpoints in its lookback window, first and last touch 40%
    * each, the middle 20% spread over interior touches (1 touch → 100%,
    * 2 touches → 50/50 — the published position-based rule every
    * attribution vendor documents).
    *
    * Credits are EXACT INTEGER MICROS summing to exactly 1,000,000 per
    * conversion: interior touches get floor(200000/(n−2)) each and the
    * integer-division remainder lands on the LAST touch (a documented,
    * deterministic audit rule — never a float split that sums to
    * 0.999999…). Touch order is (ts, touch id) so same-microsecond
    * touches resolve identically on every engine.
    *
    * Plan: one user-keyed join of conversions to their window's touches
    * (the e7 shuffle), then position/count windows PER CONVERSION over
    * the joined rows — partition sizes are per-conversion touch counts,
    * bounded by the lookback window. Output one row per
    * (conversion, touch): (purchase_id, click_id, pos, n_touch,
    * credit_micros).
    */
  def multiTouchAttribution(events: DataFrame, lookbackMicros: Long,
                            touchType: String = "click",
                            convType: String = "purchase"): DataFrame = {
    // NTZ-tolerant micros (the Joins.micros rule: parquet reads land NTZ)
    val us = unix_micros(col("ts").cast("timestamp")).as("us")
    val touches = events.where(col("event_type") === touchType)
      .select(col("event_id").as("click_id"), col("user_id"), us)
      .withColumnRenamed("us", "t_us")
    val convs = events.where(col("event_type") === convType)
      .select(col("event_id").as("purchase_id"), col("user_id"), us)
      .withColumnRenamed("us", "p_us")
    val joined = convs.join(touches, Seq("user_id"))
      .where(col("t_us") <= col("p_us") &&
        col("t_us") > col("p_us") - lookbackMicros)
    val w = Window.partitionBy("purchase_id").orderBy(col("t_us"), col("click_id"))
    val n = count(lit(1)).over(Window.partitionBy("purchase_id"))
    val pos = row_number().over(w).cast("long")
    val base = joined.select(col("purchase_id"), col("click_id"),
      pos.as("pos"), n.as("n_touch"))
    val mid = lit(200000L)
    val midEach = (mid - pmod(mid, col("n_touch") - 2)) / (col("n_touch") - 2)
    val midRem = pmod(mid, col("n_touch") - 2)
    val credit = when(col("n_touch") === 1, lit(1000000L))
      .when(col("n_touch") === 2, lit(500000L))
      .when(col("pos") === 1, lit(400000L))
      .when(col("pos") === col("n_touch"), lit(400000L) + midRem)
      .otherwise(midEach)
    base.select(col("purchase_id"), col("click_id"), col("pos"),
      col("n_touch"), credit.cast("long").as("credit_micros"))
  }

  /** ITEM-ITEM co-occurrence neighbors from implicit feedback — the
    * "people also viewed" primitive (item-based collaborative filtering,
    * Sarwar et al. 2001 / the Amazon item-to-item recipe): for each item,
    * the top-k items most co-viewed with it, scored by the cosine of the
    * binary user-item incidence —
    *
    *   cos(a, b) = |users(a) ∩ users(b)| / √(|users(a)| · |users(b)|)
    *
    * SET semantics per (user, item) (repeat views collapse), so every
    * count is an exact integer and the score is one exact division.
    *
    * Scale shape — the blockedIdPairs discipline applied to users: the
    * self-join keys on user_id, so per-key fanout is a user's DISTINCT
    * item count, and `maxUserItems` drops the bot/crawler tail whose
    * fanout would be quadratic (the df-cap argument: a user who viewed
    * everything says nothing about any pair — standard co-occurrence
    * practice, documented recall trade). Degrees are counted AFTER the
    * cap so the score's numerator and denominator describe the same
    * population. Top-k per item is a WindowGroupLimit-eligible rank.
    */
  def itemNeighbors(events: DataFrame, itemExpr: org.apache.spark.sql.Column,
                    k: Int = 3, eventType: String = "view",
                    maxUserItems: Int = 50): DataFrame = {
    val ui = events.where(col("event_type") === eventType)
      .select(col("user_id"), itemExpr.cast("int").as("item"))
      .where(col("item").isNotNull)
      .distinct()
    val capped = ui.join(
      ui.groupBy("user_id").agg(count(lit(1)).as("nu"))
        .where(col("nu") <= maxUserItems),
      Seq("user_id"), "left_semi")
    val deg = capped.groupBy("item").agg(count(lit(1)).as("n"))
    val pairs = capped.as("a").join(capped.as("b"),
        col("a.user_id") === col("b.user_id") && col("a.item") =!= col("b.item"))
      .groupBy(col("a.item").as("item"), col("b.item").as("neighbor"))
      .agg(count(lit(1)).as("n_ab"))
    val scored = pairs
      .join(deg.select(col("item"), col("n").as("n_a")), "item")
      .join(deg.select(col("item").as("neighbor"), col("n").as("n_b")), "neighbor")
      .select(col("item"), col("neighbor"), col("n_ab"),
        round(col("n_ab") / sqrt(col("n_a") * col("n_b")), 6).as("cos"))
    val w = Window.partitionBy("item").orderBy(col("cos").desc, col("neighbor").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("item", "rank", "neighbor", "n_ab", "cos")
  }

  /** First-order MARKOV transition model over per-user event sequences —
    * the "what happens next" primitive behind next-action prediction and
    * user-journey Sankey diagrams: for every ordered pair of event types
    * (src → dst adjacent in some user's timeline), the transition count
    * and the row-normalized probability.
    *
    * Ordering is value-based: per user by (ts, event_id) — the event_id
    * tiebreak makes same-microsecond neighbors deterministic cross-engine
    * (the funnel discipline). Probabilities are EXACT integer micros via
    * floor division (`n_sd·10⁶ div n_s`) — no float ever divides, so the
    * engine and the oracle agree bit-for-bit; Σ p over a row is ≤ 10⁶
    * with the deficit being pure floor loss (documented, not remainder-
    * redistributed: a transition MATRIX is read per-cell, unlike j13's
    * credit split which must conserve).
    *
    * Plan shape at 100 TB: ONE shuffle on the user key and ONE
    * in-partition sort serve the lead() pairing (the j6/j9 discipline);
    * the (src, dst) aggregate partial-combines map-side down to
    * |types|² rows, and the per-src totals join is a broadcast over that
    * metadata-scale matrix. Nothing after the lead touches fact volume.
    */
  def transitionMatrix(events: DataFrame): DataFrame = {
    val us = unix_micros(col("ts").cast("timestamp"))
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val pairs = events
      .select(col("user_id"), col("event_id"), col("event_type"), us.as("us"))
      .withColumn("dst", lead(col("event_type"), 1).over(w))
      .where(col("dst").isNotNull)
      .select(col("event_type").as("src"), col("dst"))
    transitionsFromCounts(
      pairs.groupBy("src", "dst").agg(count(lit(1)).as("n")))
  }

  /** TOP CONVERTING PATHS — the user-journey mining primitive behind
    * "what do people actually do here": gap-sessionize each user's
    * timeline, render each session's ordered event-type sequence as a
    * path string (`view>click>purchase`), and report the top-k paths by
    * session count. The Sankey/journey report j15's per-edge matrix
    * cannot express (paths carry ORDER BEYOND one hop).
    *
    * Semantics, all value-based: sessions split where the gap from the
    * previous event exceeds `gapMicros` (strictly greater — the e2/e9
    * boundary rule); within a session events order by (ts, event_id);
    * sessions longer than `maxLen` events contribute their PREFIX (the
    * bot-tail cap: an unbounded path alphabet is the quadratic-blowup
    * smell, and a 12-step prefix identifies a journey as well as a
    * 400-step one). Ties in count break on path asc.
    *
    * Plan shape at 100 TB: ONE shuffle on the user key and ONE
    * in-partition sort serve both the lag() session split and the
    * session-ordered collect (stacked windows share the sort — the
    * j6/j9 discipline); each session collapses map-side to one slim
    * (path) row, the path aggregate partial-combines, and the top-k is
    * a TakeOrdered merge.
    */
  def topPaths(events: DataFrame, gapMicros: Long = 1800000000L,
               k: Int = 20, maxLen: Int = 12): DataFrame = {
    require(k >= 1 && maxLen >= 1, s"k=$k, maxLen=$maxLen must be positive")
    val us = unix_micros(col("ts").cast("timestamp"))
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val sessioned = events
      .select(col("user_id"), col("event_id"), col("event_type"), us.as("us"))
      .withColumn("new_s",
        when(col("us") - lag(col("us"), 1).over(w) > gapMicros, 1L)
          .otherwise(lit(0L)))
      .withColumn("sess", sum(col("new_s")).over(w))
      .withColumn("pos", row_number().over(
        Window.partitionBy("user_id", "sess").orderBy(col("us"), col("event_id"))))
      .where(col("pos") <= maxLen)
    val paths = sessioned
      .groupBy("user_id", "sess")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("event_type")))),
        e => e.getField("event_type")), ">").as("path"))
    topPathsFromSessionPaths(paths, k)
  }

  /** The path-count top-k stage of [[topPaths]] from an ALREADY-rendered
    * per-session `path` column — the seam the streaming twin (e33) feeds
    * its finalized sessions through, so stream ≡ batch for the report
    * stage by construction. Map-side-combining path aggregate, TakeOrdered
    * top-k.
    */
  def topPathsFromSessionPaths(paths: DataFrame, k: Int = 20): DataFrame =
    paths.groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(k)

  /** BOUNCE RATE by session entry action — the canonical session-quality
    * metric: of the sessions that STARTED with each event type, what
    * fraction ended after that single event (the visitor who landed and
    * left). Sessionization is the j16/e2 discipline verbatim: per-user
    * (ts, event_id) order, strict-> 30-min gap boundary, session id a
    * running boundary sum. A session's ENTRY type is its first event's
    * (value-based, tie-pinned); a bounce is a 1-event session. Rate in
    * exact floor-divided micros.
    *
    * ONE user shuffle + sort serves the boundary flags, the entry pick,
    * and the per-session count (stacked windows share the sort — the j9
    * rule); the per-entry-type rollup is a metadata-scale aggregate.
    */
  def bounceRate(events: DataFrame,
                 gapMicros: Long = 1800000000L): DataFrame = {
    require(gapMicros > 0, s"gapMicros must be positive: $gapMicros")
    val us = unix_micros(col("ts").cast("timestamp"))
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val sessioned = events
      .select(col("user_id"), col("event_id"), col("event_type"), us.as("us"))
      .withColumn("new_s",
        when(col("us") - lag(col("us"), 1).over(w) > gapMicros, 1L)
          .otherwise(lit(0L)))
      .withColumn("sess", sum(col("new_s")).over(w))
    val perSession = sessioned
      .groupBy("user_id", "sess")
      .agg(min(struct(col("us"), col("event_id"), col("event_type")))
          .getField("event_type").as("entry_type"),
        count(lit(1)).as("n_events"))
    perSession.groupBy(col("entry_type"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounces"))
      .withColumn("bounce_e6", expr("(n_bounces * 1000000) DIV n_sessions"))
      .orderBy("entry_type")
  }

  /** A/B EXPERIMENT READOUT — the statistical-inference primitive product
    * analytics runs on every experiment: users deterministically hash-
    * split into two variants (the p2 Knuth multiplicative rule — stable
    * across reruns, engines, and data orders), per-variant user and
    * converter counts tallied EXACTLY, and the two-proportion pooled
    * z-statistic computed as one fixed-shape float expression over those
    * exact integers:
    *
    *   z = (p̂_a − p̂_b) / √(p̂(1−p̂)(1/n_a + 1/n_b)),  p̂ pooled
    *
    * Conversion rates are reported in exact integer micros (floor
    * division); z is round-4 with the significance flag derived from the
    * ROUNDED value (the c8 rule — the decision never straddles an ulp).
    *
    * Plan shape: one user-keyed aggregate (map-side combining) collapses
    * the fact volume to one row per user; the variant tally is a second
    * 2-row aggregate; everything after is a 1-row projection. No joins.
    */
  def abReadout(events: DataFrame, convType: String = "purchase",
                minConv: Int = 14, zCrit: Double = 1.96): DataFrame = {
    val perUser = events.groupBy("user_id")
      .agg(sum(when(col("event_type") === convType, 1L).otherwise(0L))
        .as("np"))
      // "converted" = at least minConv conversion events: with the
      // synthetic corpus's uniform event mix EVERY user purchases at
      // least once, so a has-any rule saturates both rates at 1 and the
      // pooled variance at 0 — the count threshold keeps the readout a
      // real two-proportion problem at every SF (same per-user rate)
      .select(when(col("np") >= minConv, 1L).otherwise(0L).as("conv"),
        pmod(pmod(col("user_id") * lit(2654435761L), lit(4294967296L)),
          lit(2)).as("v"))
    val t = perUser.agg(
      sum(when(col("v") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("v") === 0, col("conv")).otherwise(0L)).as("k_a"),
      sum(when(col("v") === 1, 1L).otherwise(0L)).as("n_b"),
      sum(when(col("v") === 1, col("conv")).otherwise(0L)).as("k_b"))
    val d = "double"
    val pa = col("k_a").cast(d) / col("n_a")
    val pb = col("k_b").cast(d) / col("n_b")
    val pp = (col("k_a") + col("k_b")).cast(d) / (col("n_a") + col("n_b"))
    // the variance CAN be exactly 0 (all or none convert): guard the
    // division on the exact double compare so ANSI mode never raises and
    // the degenerate readout reports z = null instead of ±inf
    val sq = pp * (lit(1.0) - pp) *
      (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))
    val z = when(sq > 0, round((pa - pb) / sqrt(sq), 4))
    t.select(col("n_a"), col("k_a"), col("n_b"), col("k_b"),
        expr("k_a * 1000000 DIV n_a").as("rate_a_micros"),
        expr("k_b * 1000000 DIV n_b").as("rate_b_micros"),
        z.as("z"))
      .withColumn("significant",
        when(col("z").isNotNull, abs(col("z")) > zCrit))
  }

  /** [[transitionMatrix]]'s probability tail over ANY (src, dst, n) count
    * table — the SUM-MERGEABLE half: per-batch transition counts fold by
    * plain addition, which is what lets a stream keep the matrix current
    * (e29 rides the e15/e28 delta-log discipline on exactly this table).
    */
  def transitionsFromCounts(counts: DataFrame): DataFrame = {
    val totals = counts.groupBy("src").agg(sum("n").as("n_src"))
    counts.join(broadcast(totals), "src")
      .select(col("src"), col("dst"), col("n"),
        expr("n * 1000000 DIV n_src").as("p_micros"))
      .orderBy("src", "dst")
  }

  /** EXIT-ACTION histogram of NON-CONVERTERS — for the users
    * [[timeToConvert]] drops (saw the product, never bought FROM that
    * view), what was the LAST thing they did? The abandonment-diagnosis
    * report behind "where do we lose people" — a tail of `view` exits
    * reads as disinterest, a tail of `click` exits as a broken step
    * after engagement. Population = users with a first view and NO
    * purchase inside `[first view, first view + horizonMicros]` — the
    * j9 anchored-conversion-window rule (an unbounded window is
    * degenerate on a long-lived corpus: everyone converts eventually
    * and the report is empty by construction).
    * Each user's exit is their (event time, event_id)-maximal event —
    * one deterministic per-user argmax, no session machinery needed.
    *
    * Plan: the first-view aggregate and the converter probe share the
    * user key (co-partitioned anti-join), the exit argmax is one
    * user-partitioned rank window over the non-converters' events, the
    * histogram a |types|-row aggregate with shares in floor-divided
    * micros. Output: `(exit_type, n_users, share_e6)` ordered by
    * (n desc, type).
    */
  def exitActions(events: DataFrame, viewType: String = "view",
                  convType: String = "purchase",
                  horizonMicros: Long = 86400L * 1000000L): DataFrame = {
    require(horizonMicros > 0, "horizonMicros must be positive")
    val e = events.select(col("user_id"), col("event_id"), col("event_type"),
      unix_micros(col("ts").cast("timestamp")).as("us"))
    val firstView = e.where(col("event_type") === viewType)
      .groupBy("user_id").agg(min("us").as("tv"))
    val converters = e.where(col("event_type") === convType)
      .join(firstView, "user_id")
      .where(col("us") >= col("tv") && col("us") <= col("tv") + horizonMicros)
      .select("user_id").distinct()
    val nonConv = firstView.join(converters, Seq("user_id"), "left_anti")
      .select("user_id")
    val w = Window.partitionBy("user_id")
      .orderBy(col("us").desc, col("event_id").desc)
    val exits = e.join(nonConv, "user_id")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .groupBy(col("event_type").as("exit_type"))
      .agg(count(lit(1)).as("n_users"))
    exits.crossJoin(broadcast(exits.agg(sum("n_users").as("tot"))))
      .select(col("exit_type"), col("n_users"),
        expr("(n_users * 1000000) DIV tot").as("share_e6"))
      .orderBy(col("n_users").desc, col("exit_type"))
  }

  /** HOURLY session-CONCURRENCY profile — how many sessions were LIVE in
    * each clock hour: the capacity-planning load curve behind "when do we
    * scale" ("events per hour" undercounts long quiet sessions that
    * still hold server state; this counts sessions OVERLAPPING the
    * hour). Sessions come from the shared j16/e2 gap chain (strict >,
    * (ts, event_id) order); each session explodes to the hour buckets
    * its [first, last] span touches (bin-exploded interval counting —
    * the Joins point-in-interval discipline: fan-out bounded by session
    * duration in hours, never a session×hour join), then ONE map-side-
    * combining per-hour count. No global window anywhere — the +1/−1
    * running-sum formulation this replaces would funnel every session
    * boundary through one ordered partition.
    *
    * Output: `(hour, n_sessions)` as exact timestamps/longs ordered by
    * hour.
    */
  def sessionConcurrency(events: DataFrame,
                         gapMicros: Long = 1800000000L): DataFrame = {
    require(gapMicros > 0, s"gapMicros must be positive: $gapMicros")
    val us = unix_micros(col("ts").cast("timestamp"))
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val spans = events
      .select(col("user_id"), col("event_id"), us.as("us"))
      .withColumn("new_s",
        when(col("us") - lag(col("us"), 1).over(w) > gapMicros, 1L)
          .otherwise(lit(0L)))
      .withColumn("sess", sum(col("new_s")).over(w))
      .groupBy("user_id", "sess")
      .agg(min("us").as("st"), max("us").as("en"))
    spans
      // floor division via pmod (Spark DIV truncates toward zero, the
      // DuckDB oracle's // floors — they disagree on negative epochs)
      .select(explode(sequence(
        expr("(st - pmod(st, 3600000000)) DIV 3600000000"),
        expr("(en - pmod(en, 3600000000)) DIV 3600000000"))).as("h"))
      .groupBy("h").agg(count(lit(1)).as("n_sessions"))
      .select(timestamp_micros(col("h") * lit(3600000000L)).as("hour"),
        col("n_sessions"))
      .orderBy("hour")
  }

  /** TIME-TO-CONVERT profile: per acquisition cohort, how long users take
    * from their FIRST view to their first purchase at-or-after it — the
    * conversion-velocity report behind "is the funnel getting faster",
    * cohorted so product changes show up as between-cohort shifts instead
    * of being averaged away (the j12 cohort discipline applied to a
    * latency). Users whose only purchases predate their first view never
    * converted FROM the view and drop out (the j9 anchor rule).
    *
    * Cohort = ISO week (date_trunc week — Monday-start on both engines)
    * of the first view. The summary is the c11/j18 exact-order-statistic
    * discipline: lower median and lower p90 of the per-user lag micros,
    * rank `(n+1) DIV 2` / `(9n+9) DIV 10` — exact longs both engines
    * agree on bit-for-bit.
    *
    * Plan: one user-keyed aggregate for first views, the purchase slice
    * joined back on the SAME key (co-partitioned — AQE reuses the
    * exchange) and min-aggregated, then the rank window over cohort-week
    * partitions of one slim row per CONVERTING user — the same
    * partitioned-window shape as j18, nothing global sorts. Output:
    * `(cohort_week, n_users, med_lag_us, p90_lag_us)` ordered by week.
    */
  def timeToConvert(events: DataFrame, viewType: String = "view",
                    convType: String = "purchase"): DataFrame = {
    val e = events.select(col("user_id"), col("event_type"),
      unix_micros(col("ts").cast("timestamp")).as("us"))
    val firstView = e.where(col("event_type") === viewType)
      .groupBy("user_id").agg(min("us").as("tv"))
    val firstConv = e.where(col("event_type") === convType)
      .join(firstView, "user_id")
      .where(col("us") >= col("tv"))
      .groupBy("user_id").agg(min("us").as("tp"), min("tv").as("tv"))
    val lags = firstConv.select(col("user_id"),
      date_trunc("week", timestamp_micros(col("tv")))
        .cast("date").cast("string").as("cohort_week"),
      (col("tp") - col("tv")).as("lag_us"))
    val wOrd = Window.partitionBy("cohort_week").orderBy(col("lag_us"), col("user_id"))
    val wAll = Window.partitionBy("cohort_week")
    lags
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
      .groupBy("cohort_week")
      .agg(max("n").as("n_users"),
        max(when(col("rn") === expr("(n + 1) DIV 2"), col("lag_us")))
          .as("med_lag_us"),
        max(when(col("rn") === expr("(9 * n + 9) DIV 10"), col("lag_us")))
          .as("p90_lag_us"))
      .orderBy("cohort_week")
  }

  /** Per-event-type DWELL-TIME profile: how long users sit on each action
    * before their next one — the engagement statistic behind "is this
    * step where people stall". An event's dwell is the gap to the SAME
    * user's next event (ts, event_id order — the funnel tie discipline),
    * kept only when the gap is within `sessionGapMicros` (a gap past the
    * session boundary is an absence, not a dwell — the e2/j16 boundary
    * rule, strict >). Session-final events have no dwell and drop out.
    *
    * The summary is the c11 exact-order-statistic discipline: lower
    * median and lower p90 of the dwell micros per type (rank
    * `(n+1) DIV 2` / `(9n+9) DIV 10` order statistics — exact longs both
    * engines agree on bit-for-bit), plus exact n and max. Two shuffles:
    * the user timeline sort (shared shape with every j-family operator),
    * then the per-type rank window; both keys are the natural partition
    * axes and nothing global sorts.
    */
  def dwellTimes(events: DataFrame,
                 sessionGapMicros: Long = 1800L * 1000000L): DataFrame = {
    require(sessionGapMicros > 0, s"sessionGapMicros must be positive")
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val dwell = events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
      .withColumn("dwell_us", lead(col("us"), 1).over(w) - col("us"))
      .where(col("dwell_us").isNotNull &&
        col("dwell_us") <= sessionGapMicros)
    val wOrd = Window.partitionBy("event_type").orderBy("dwell_us")
    val wAll = Window.partitionBy("event_type")
    dwell
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
      .groupBy("event_type")
      .agg(max("n").as("n"),
        max(when(col("rn") === expr("(n + 1) DIV 2"), col("dwell_us")))
          .as("med_dwell_us"),
        max(when(col("rn") === expr("(9 * n + 9) DIV 10"), col("dwell_us")))
          .as("p90_dwell_us"),
        max("dwell_us").as("max_dwell_us"))
      .orderBy("event_type")
  }

  /** STICKINESS — the DAU/MAU engagement ratio per day, the one-number
    * habit metric every product dashboard leads with (a product opened
    * daily reads ~10⁶ micros against its own monthly audience; a
    * once-a-month tool reads ~33 000): daily distinct users over
    * trailing-`windowDays` distinct users, on the DENSIFIED calendar
    * spine (the c5 rule — a zero-event day reports dau 0, it never
    * vanishes), ratio in exact floor-div micros, null when the trailing
    * window is empty ("undefined" never aliases "zero").
    *
    * Plan shape: events collapse ONCE to distinct (day, user) pairs —
    * the only corpus-scale shuffle; the |days|-row spine then range-joins
    * those pairs as a BROADCAST (spine side), so the trailing-window
    * expansion is bounded at windowDays × |pairs| with no second pass
    * over raw events. This is the exact GATE tier: at 100 TB the
    * mergeable path is the x16 per-day distinct-sketch rollup (HLL
    * union over any window, no pair expansion) — this entry holds that
    * tier honest, the t12/c1 exact-vs-sketch discipline.
    */
  def stickiness(events: DataFrame, windowDays: Int = 28): DataFrame =
    stickinessFromPairs(
      events.select(to_date(col("ts")).as("day"), col("user_id")).distinct(),
      windowDays)

  /** The report half of [[stickiness]] over an already-distinct
    * `(day, user_id)` pair table — batch-derived or rebuilt from a
    * streamed SET log (e37): distinct-union is order-free and
    * duplicate-delivery-immune (the e31 set-log argument), so the shared
    * report makes stream ≡ batch by construction.
    */
  def stickinessFromPairs(pairs: DataFrame, windowDays: Int = 28): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1: $windowDays")
    val spine = pairs.agg(min("day").as("lo"), max("day").as("hi"))
      .select(explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
    val dau = pairs.groupBy("day").agg(count(lit(1)).as("dau"))
    val mau = pairs
      .join(broadcast(spine.select(col("day").as("sday"))),
        col("day").between(date_sub(col("sday"), windowDays - 1), col("sday")))
      .groupBy(col("sday").as("day"))
      .agg(countDistinct("user_id").as("mau"))
    spine.join(dau, Seq("day"), "left").join(mau, Seq("day"), "left")
      .select(col("day").cast("string").as("day"),
        coalesce(col("dau"), lit(0L)).as("dau"),
        coalesce(col("mau"), lit(0L)).as("mau"))
      .withColumn("stickiness_e6",
        when(col("mau") > 0, expr("dau * 1000000 DIV mau")))
      .orderBy("day")
  }
}
