package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality validation over corpus and fact tables — the
  * pre-ingest gate a training-data pipeline runs before a corpus version
  * is allowed to feed a run (the Deequ/Great-Expectations capability,
  * re-expressed as declarative single-pass Spark aggregates).
  *
  * Four tiers, each its own registered entry:
  *
  *   - [[columnProfile]]: per-column completeness / cardinality / bounds —
  *     the "what does this table look like" report.
  *   - [[constraintChecks]]: named assertions (row predicates + key
  *     uniqueness) evaluated as violation COUNTS in one aggregate pass —
  *     the pass/fail gate.
  *   - [[refIntegrity]]: foreign-key orphan detection between two tables.
  *   - [[keySkewProfile]]: join/groupBy-key distribution — the heavy-key
  *     diagnosis that decides whether a downstream join needs salting
  *     ([[Joins.saltedJoin]]) before it is launched at scale.
  *
  * At 100 TB: every tier is aggregation-shaped. The profile and the
  * constraint suite are ONE scan each — every per-column/per-check
  * statistic is a combine-safe aggregate riding the same pass (the only
  * exception is exact distinct counts, whose multi-column form Spark
  * plans as one Expand ×(P+1) pass — documented on [[columnProfile]],
  * with the Expand-free approx twin as the at-scale default). Referential
  * integrity projects ids ONLY before the anti-join (16 B rows, never the
  * payload). The skew profile is a two-level aggregate: per-key counts
  * combine map-side, then combine-safe scalar stats over the persisted
  * per-key table, broadcast back as one row — never a single-partition
  * window over it (the per-key table is corpus-cardinality-sized for
  * exactly the keys worth diagnosing).
  */
object Quality {

  /** Per-column profile in long form: one row per profiled column,
    * `(column, n_rows, n_nulls, completeness, n_distinct, min_value,
    * max_value)` — min/max cast to string so mixed-type columns share one
    * report schema. Column order of `cols` is preserved in the output.
    *
    * ONE aggregate pass computes every statistic. The exact
    * `n_distinct`s make Spark plan an Expand ×(P+1) over the scan (the
    * standard multi-distinct rewrite): correct and still map-side-combining,
    * but the scan's rows are replicated P+1 ways before the partial
    * aggregate. At 100 TB profile with [[columnProfileApprox]] (HLL++
    * distincts, no Expand, one unreplicated pass) — the exact form is the
    * gate, the sketch form is the default; QualitySpec pins the twin
    * within its error bound (the t12 exact/sketch discipline).
    */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame =
    profileWith(df, cols, c => countDistinct(col(c)))

  /** The Expand-free at-scale twin: HLL++ `approx_count_distinct`
    * (rsd 1%) for `n_distinct`, everything else identical and exact. */
  def columnProfileApprox(df: DataFrame, cols: Seq[String]): DataFrame =
    profileWith(df, cols, c => approx_count_distinct(col(c), 0.01))

  private def profileWith(df: DataFrame, cols: Seq[String],
                          distinctOf: String => Column): DataFrame = {
    require(cols.nonEmpty, "columnProfile needs at least one column")
    val aggs = cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1).otherwise(0)).cast("long").as(s"__nulls_$c"),
      distinctOf(c).as(s"__nd_$c"),
      min(col(c)).cast("string").as(s"__min_$c"),
      max(col(c)).cast("string").as(s"__max_$c")))
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*)
    row.select(explode(array(cols.map(c => struct(
        lit(c).as("column"),
        col("__n").as("n_rows"),
        col(s"__nulls_$c").as("n_nulls"),
        round(lit(1.0) - col(s"__nulls_$c") / col("__n"), 6).as("completeness"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))): _*)).as("p"))
      .select("p.*")
  }

  /** Named constraint suite in one aggregate pass: each row-level check is
    * `(name, violationPredicate)` — the predicate marks BAD rows — and each
    * uniqueness check is a column set whose duplicate-row excess
    * (`count(*) − count(distinct key)`) is the violation count. Output one
    * row per check, `(check, n_rows, n_violations, pass)`, in declaration
    * order (row checks then uniqueness checks).
    *
    * All row checks are combine-safe conditional sums on ONE scan; the
    * uniqueness counts join the same `agg` as distinct aggregates (Expand,
    * as [[columnProfile]] — at 100 TB prefer one uniqueness key per suite,
    * or gate uniqueness on a two-level `groupBy(key).count.where(cnt > 1)`
    * pass whose per-key partials combine map-side).
    */
  def constraintChecks(df: DataFrame, rowChecks: Seq[(String, Column)],
                       uniqueKeys: Seq[(String, Seq[String])] = Nil): DataFrame = {
    require(rowChecks.nonEmpty || uniqueKeys.nonEmpty, "empty constraint suite")
    val rowAggs = rowChecks.map { case (name, bad) =>
      sum(when(bad, 1).otherwise(0)).cast("long").as(s"__v_$name") }
    val uniqAggs = uniqueKeys.map { case (name, keyCols) =>
      (count(lit(1)) - countDistinct(struct(keyCols.map(col): _*)))
        .cast("long").as(s"__v_$name") }
    val row = df.agg(count(lit(1)).as("__n"), rowAggs ++ uniqAggs: _*)
    val names = rowChecks.map(_._1) ++ uniqueKeys.map(_._1)
    row.select(explode(array(names.map(n => struct(
        lit(n).as("check"),
        col("__n").as("n_rows"),
        col(s"__v_$n").as("n_violations"),
        (col(s"__v_$n") === 0L).as("pass"))): _*)).as("c"))
      .select("c.*")
  }

  /** Foreign-key orphan check: child rows whose `childKey` has no match in
    * `parent(parentKey)`. One row, `(fk, n_child, n_orphans, pass)`.
    *
    * ONE scan of the child: its key column left-joins the parent's
    * DEDUPLICATED key set (the distinct keeps join multiplicity at one,
    * so row counts survive the join), and total/orphan counts fall out of
    * a single aggregate over the joined rows — a null child key and a
    * no-match key both surface as an unmatched row, so null FKs count as
    * orphans (a null never joins; surfacing it is the check's job, not
    * silently passing it). Both sides project their key ONLY, so the
    * shuffle carries 8–16 B rows whatever the table width. At 100 TB the
    * join is either a broadcast (dim-sized parent) or a co-partitioned
    * shuffle on the key — and a `bloom_filter_agg` runtime filter
    * ([[Joins.withRuntimeBloomJoin]]) prunes definite-matches before the
    * shuffle when the orphan rate is low (the common case: most rows
    * pass, few shuffle).
    */
  def refIntegrity(child: DataFrame, childKey: String,
                   parent: DataFrame, parentKey: String,
                   fkName: String): DataFrame = {
    val c = child.select(col(childKey).as("__k"))
    val p = parent.select(col(parentKey).as("__k")).where(col("__k").isNotNull)
      .distinct().withColumn("__hit", lit(1))
    c.join(p, Seq("__k"), "left")
      .agg(count(lit(1)).as("n_child"),
        sum(when(col("__hit").isNull, 1).otherwise(0)).cast("long").as("n_orphans"))
      .select(lit(fkName).as("fk"), col("n_child"), col("n_orphans"),
        (col("n_orphans") === 0L).as("pass"))
  }

  /** Ingest-volume DRIFT detection: per-day event counts compared against
    * the trailing `lookback`-day average — the monitoring gate that
    * catches a collapsed (or double-delivered) feed before a corpus
    * version ships. Output one row per CALENDAR day between the first and
    * last observed day: `(day, cnt, win_days, dev_frac, flagged)` where
    * `dev_frac` is the day's fractional deviation from the trailing mean
    * (null for days with no history) and `flagged` marks |dev| >
    * `tolerance`.
    *
    * The day axis is DENSIFIED before the window: a day with zero events —
    * the fully-collapsed feed this gate exists to catch — produces no
    * aggregate row at all, so windowing only the present days would both
    * miss it entirely and silently stretch "trailing `lookback` days" to
    * the previous `lookback` PRESENT days. The calendar spine
    * (`sequence(min, max)` exploded, left-joined, gaps as cnt 0) makes a
    * dead day surface as `dev_frac = −1, flagged`, and the window span
    * true calendar days.
    *
    * Determinism rule: no variance/stddev — engines disagree on the
    * accumulation formula bit-level — and no divided average: the
    * deviation is computed as `cnt × win_n / win_sum − 1` so the only
    * floating-point step is one final division of exact integers,
    * identical everywhere.
    *
    * At 100 TB: the raw corpus collapses to |days| rows in one
    * map-side-combining aggregate BEFORE the spine join and the trailing
    * window, so the single-partition window sort everyone fears is over
    * metadata (a century is 36 525 rows) — never over events.
    */
  def volumeDrift(events: DataFrame, tsCol: String, lookback: Int = 7,
                  tolerance: Double = 0.5): DataFrame = {
    require(lookback > 0, s"lookback must be positive: $lookback")
    // persisted: the spine's min/max and the left join both read the daily
    // aggregate — without the persist each branch would re-scan the EVENTS
    // (Catalyst does not reuse the grouping exchange across branches), and
    // that double read is the only corpus-scale cost in the plan
    val daily = events.groupBy(to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val spine = daily.agg(min("day").as("lo"), max("day").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("day"))
    val dense = spine.join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("cnt"), lit(0L)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("day").rowsBetween(-lookback, -1)
    val dev = when(col("win_n") > 0 && col("win_sum") > 0,
      round(col("cnt") * col("win_n") / col("win_sum") - 1.0, 6))
    val out = dense.select(col("day").cast("string").as("day"), col("cnt"),
        sum("cnt").over(w).as("win_sum"),
        count(lit(1)).over(w).as("win_n"))
      .select(col("day"), col("cnt"), col("win_n").as("win_days"),
        dev.as("dev_frac"),
        coalesce(abs(dev) > tolerance, lit(false)).as("flagged"))
      .orderBy("day")
      // materialize the |days|-row report eagerly so the corpus-scale
      // intermediate cache can be released NOW — without this, repeated
      // calls in a long session pin dailies until LRU eviction
      .localCheckpoint(true)
    daily.unpersist()
    out
  }

  /** SEASONAL volume baseline: per-day counts vs the trailing same-WEEKDAY
    * mean — the monitor [[volumeDrift]] (c5) cannot be: a flat trailing
    * window flags every weekend of a weekly-cyclic feed as a collapse and
    * every Monday as a spike, while this one compares Sundays to the four
    * Sundays before them. Deviation stays the c5 discipline — one exact
    * integer product `cnt × win_n` against `win_sum`, divided ONCE at the
    * end — so engine and oracle agree bit-for-bit; the flag reads the
    * ROUNDED value (the c4/j17 rounded-gate rule).
    *
    * Mechanics: the daily aggregate is densified over a calendar spine
    * (the c5 dead-day rule: a silent day must surface as cnt 0, dev −1,
    * flagged — not vanish), then windowed PARTITION BY weekday ORDER BY
    * day, ROWS −`weeks`..−1. On the dense spine the `weeks` preceding
    * rows of a weekday partition are exactly the prior `weeks` same-
    * weekday calendar days. `dow` is ISO (1 = Monday … 7 = Sunday):
    * Spark's `weekday` + 1 ≡ DuckDB's `isodow`, pinned here because the
    * engines' default `dayofweek` disagree on where Sunday lands.
    *
    * At 100 TB: the corpus collapses to |days| rows in one map-side-
    * combining aggregate BEFORE the spine join; the window then runs over
    * SEVEN partitions of |days|/7 metadata rows — strictly better-spread
    * than c5's one (a century is ~5 200 rows per weekday).
    */
  def seasonalVolume(events: DataFrame, tsCol: String, weeks: Int = 4,
                     tolerance: Double = 0.5): DataFrame =
    seasonalVolumeFromDaily(
      events.groupBy(to_date(col(tsCol)).as("day"))
        .agg(count(lit(1)).as("cnt")),
      weeks, tolerance)

  /** [[seasonalVolume]] from an ALREADY-aggregated `(day, cnt)` table —
    * the entry point the streaming twin folds its per-batch daily-count
    * log into (e30): the report logic is shared verbatim, so stream ≡
    * batch by construction.
    */
  def seasonalVolumeFromDaily(dailyIn: DataFrame, weeks: Int = 4,
                              tolerance: Double = 0.5): DataFrame = {
    require(weeks > 0, s"weeks must be positive: $weeks")
    val daily = dailyIn
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val spine = daily.agg(min("day").as("lo"), max("day").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("day"))
    val dense = spine.join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("cnt"), lit(0L)).as("cnt"),
        (weekday(col("day")) + 1).as("dow"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("dow").orderBy("day").rowsBetween(-weeks, -1)
    val dev = when(col("win_n") > 0 && col("win_sum") > 0,
      round(col("cnt") * col("win_n") / col("win_sum") - 1.0, 6))
    val out = dense.select(col("day").cast("string").as("day"),
        col("dow").cast("int").as("dow"), col("cnt"),
        sum("cnt").over(w).as("win_sum"),
        count(lit(1)).over(w).as("win_n"))
      .select(col("day"), col("dow"), col("cnt"),
        col("win_n").as("win_weeks"),
        dev.as("dev_frac"),
        coalesce(abs(dev) > tolerance, lit(false)).as("flagged"))
      .orderBy("day")
      .localCheckpoint(true)
    daily.unpersist()
    out
  }

  /** CHANGEPOINT gate: two-sided integer CUSUM over the daily-count spine
    * (Page 1954) — the drift family's detector for PERSISTENT SMALL
    * SHIFTS. [[volumeDrift]] (c5) flags a day deviating ±50% from its
    * trailing window and [[seasonalVolumeFromDaily]] (c10) the same per
    * weekday; a feed that quietly steps up 8% forever never trips either,
    * but its small daily excesses ACCUMULATE — which is exactly what
    * CUSUM sums: everything beyond a slack allowance over an in-control
    * target, reset whenever the sum goes negative.
    *
    * The target is CALIBRATED on the first `baselineDays` spine days (sum
    * B = Σ baseline counts — the "in-control" reference every production
    * CUSUM needs; targeting the global mean instead would flag BOTH sides
    * of any step, since the pre-period sits below the all-time mean by
    * construction). Exact-integer discipline: the scaled deviation of day
    * i is dᵢ = cntᵢ·`baselineDays` − B (count·days units — the c5 trick
    * of multiplying through instead of dividing), slack k = B div
    * `slackDiv` (default 50 → 2% of the baseline daily mean, scaled), and
    * the textbook recurrence S⁺ᵢ = max(0, S⁺ᵢ₋₁ + dᵢ − k) is computed in
    * CLOSED FORM as S⁺ᵢ = cumᵢ − min(0, min_{j≤i} cumⱼ) over
    * cumᵢ = Σ_{j≤i}(dⱼ − k) — a running sum minus a running min, both
    * plain windows, so the sequential recurrence needs no iteration and
    * the DuckDB oracle replays it verbatim. S⁻ mirrors with −dᵢ. A day
    * fires when either side exceeds H = B div `threshDiv` (default 4 → a
    * quarter baseline-day of accumulated excess — an 8% step trips in
    * days, sf0.01's organic noise peaks at ~66% of it). Known caveat,
    * inherent to CUSUM: a corrupted baseline period mis-calibrates the
    * gate — c5/c10 remain the per-day screens that would catch that.
    *
    * Plan: one corpus-scale map-side-combining daily aggregate; the spine
    * join, the 1-row baseline broadcast, and all four windows run over
    * |days| metadata rows (the documented c4/c9 single-partition-spine
    * discipline). Output: `(day, cnt, cusum_pos, cusum_neg, flagged)`
    * ordered by day.
    */
  def cusumShift(events: DataFrame, tsCol: String, baselineDays: Int = 7,
                 slackDiv: Long = 50, threshDiv: Long = 4): DataFrame =
    cusumShiftFromDaily(
      events.groupBy(to_date(col(tsCol)).as("day"))
        .agg(count(lit(1)).as("cnt")),
      baselineDays, slackDiv, threshDiv)

  /** [[cusumShift]] from an ALREADY-aggregated `(day, cnt)` table — the
    * seam specs plant shifts through and a streamed daily-count log
    * (e30's substrate) folds into.
    */
  def cusumShiftFromDaily(dailyIn: DataFrame, baselineDays: Int = 7,
                          slackDiv: Long = 50, threshDiv: Long = 4): DataFrame = {
    require(baselineDays > 0, s"baselineDays must be positive: $baselineDays")
    require(slackDiv > 0, s"slackDiv must be positive: $slackDiv")
    require(threshDiv > 0, s"threshDiv must be positive: $threshDiv")
    val daily = dailyIn
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val spine = daily.agg(min("day").as("lo"), max("day").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("day"))
    val dense = spine.join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("cnt"), lit(0L)).as("cnt"))
    val base = dense.orderBy("day").limit(baselineDays)
      .agg(sum("cnt").as("bsum"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("day")
    val out = dense.crossJoin(broadcast(base))
      .select(col("day"), col("cnt"),
        expr(s"cnt * ${baselineDays}L - bsum - bsum DIV $slackDiv").as("dp"),
        expr(s"bsum - cnt * ${baselineDays}L - bsum DIV $slackDiv").as("dm"),
        expr(s"bsum DIV $threshDiv").as("h"))
      .select(col("day"), col("cnt"), col("h"),
        sum("dp").over(w).as("cp"), sum("dm").over(w).as("cm"))
      .select(col("day").cast("string").as("day"), col("cnt"), col("h"),
        (col("cp") - least(lit(0L), min("cp").over(w))).as("cusum_pos"),
        (col("cm") - least(lit(0L), min("cm").over(w))).as("cusum_neg"))
      .select(col("day"), col("cnt"), col("cusum_pos"), col("cusum_neg"),
        (col("cusum_pos") > col("h") || col("cusum_neg") > col("h")).as("flagged"))
      .orderBy("day")
      .localCheckpoint(true)
    daily.unpersist()
    out
  }

  /** Categorical VALUE-ENTROPY profile — Shannon entropy per column, the
    * balance statistic beside [[columnProfile]]'s cardinality (two
    * columns with 8 distinct values are profiled identically there even
    * when one is uniform and the other is 99% a single value — the skew
    * that decides partition keys, stratification axes, and whether a
    * "category" column is real signal or a constant with typos). The
    * Deequ-family Entropy check, made engine-exact.
    *
    * Exactness: entropy = Σ nᵢ·ln(N/nᵢ) / N. Each TERM quantizes to
    * round-half-up integer micros BEFORE the sum (identical long counts
    * into libm ln on both engines — the c8/t11 discipline), the sum is
    * an order-free exact long, and the single division is a floor DIV
    * on non-negative operands — so a uniform 8-value column reads
    * ln 8 = 2.079441 e6 bit-for-bit anywhere. Columns melt through ONE
    * explode into a single (column, value) aggregate — one pass for the
    * whole profile, the columnProfile shape. Output: `(column, n_rows,
    * n_distinct, entropy_e6)` ordered by column.
    */
  def valueEntropy(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "valueEntropy needs at least one column")
    val melted = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("col"), col(c).cast("string").as("val"))): _*)).as("m"))
      .select("m.*")
    val counts = melted.groupBy("col", "val").agg(count(lit(1)).as("n"))
    val totals = counts.groupBy("col").agg(sum("n").as("nr"))
    counts.join(broadcast(totals), "col")
      .withColumn("e",
        expr("CAST(round(n * ln(nr / CAST(n AS DOUBLE)) * 1000000, 0) AS BIGINT)"))
      .groupBy("col")
      .agg(max("nr").as("n_rows"), count(lit(1)).as("n_distinct"),
        sum("e").as("s"))
      .select(col("col").as("column"), col("n_rows"), col("n_distinct"),
        expr("s DIV n_rows").as("entropy_e6"))
      .orderBy("column")
  }

  /** CHI-SQUARED homogeneity test between two snapshots of a CATEGORICAL
    * column — the drift battery's categorical member (c8's PSI bins a
    * NUMERIC margin, c9's KS needs an ordering; a category/format/lang
    * column has neither): did the composition of values change between
    * corpus versions, weighted the way the published test weights it —
    * rare categories' swings count more than the same absolute swing in
    * a dominant one, exactly what a per-bucket |Δfraction| report
    * undercounts.
    *
    * Each side's contribution for category i is computed in EXACT
    * integers from the contingency table alone:
    *
    *   termₛ(i) = (obsₛ·N − nₛ·mᵢ)² · 10⁶ div (nₛ·mᵢ·N)
    *
    * (obsₛ the side's count, nₛ the side total, mᵢ the pooled category
    * count, N = n₁+n₂) — the (o−e)²/e term with the rational expected
    * count cleared of divisions: one floor DIV per term on non-negative
    * DECIMAL-widened operands (the quadruple product overflows a long at
    * corpus scale), so both engines agree bit-for-bit and the statistic
    * is the exact-integer sum of per-category terms. A category absent
    * from one side contributes through obs = 0 — the vanished-category
    * signal PSI needs Laplace smoothing to see finitely; mᵢ ≥ 1 by
    * construction so no zero division exists.
    *
    * Plan: both sides union-tagged into ONE map-side-combining
    * (value, side) aggregate — one shuffle of category-scale rows, the
    * 1-row side totals broadcast back, everything after metadata-scale.
    * Output: `(category, n_1, n_2, chi2_term_e6)` per category ordered
    * by category — Σ chi2_term_e6 against the df = k−1 critical value is
    * the caller's one-number gate, and the per-category terms localize
    * WHICH value moved.
    *
    * Range contract: the cleared-denominator numerator is O(N⁴·10⁶), so
    * DECIMAL(38,0)/HUGEINT exactness holds to N ≈ 10⁸ rows per
    * snapshot pair; past that, run the gate on a stratified sample (the
    * exact-gate-vs-sketch discipline — composition drift at that scale
    * is visible in any 10⁷-row stratum).
    */
  def chiSquareDrift(v1: DataFrame, v2: DataFrame, catCol: String): DataFrame = {
    require(!v1.isEmpty && !v2.isEmpty,
      "chiSquareDrift needs both snapshots non-empty (a zero side total " +
        "has no expected counts)")
    val tagged = v1.select(col(catCol).cast("string").as("category"), lit(1).as("side"))
      .unionByName(v2.select(col(catCol).cast("string").as("category"), lit(2).as("side")))
    chiSquareFromCells(tagged.groupBy("category")
      .agg(sum(when(col("side") === 1, 1L).otherwise(0L)).as("a"),
        sum(when(col("side") === 2, 1L).otherwise(0L)).as("b")))
  }

  /** The report half of [[chiSquareDrift]]: a contingency table
    * `(category, a, b)` — batch-aggregated or rebuilt from streamed
    * count logs (e36) — to the per-category exact-term report. Shared so
    * stream ≡ batch by construction, the e34/e35 rule.
    */
  def chiSquareFromCells(cells: DataFrame): DataFrame = {
    val totals = cells.agg(sum("a").as("n1"), sum("b").as("n2"))
    cells.crossJoin(broadcast(totals))
      .select(col("category"), col("a").as("n_1"), col("b").as("n_2"),
        expr("""
          CAST(
            (CAST(a AS DECIMAL(38,0)) * (n1 + n2) - CAST(n1 AS DECIMAL(38,0)) * (a + b))
              * (CAST(a AS DECIMAL(38,0)) * (n1 + n2) - CAST(n1 AS DECIMAL(38,0)) * (a + b))
              * 1000000
              DIV (CAST(n1 AS DECIMAL(38,0)) * (a + b) * (n1 + n2))
            + (CAST(b AS DECIMAL(38,0)) * (n1 + n2) - CAST(n2 AS DECIMAL(38,0)) * (a + b))
              * (CAST(b AS DECIMAL(38,0)) * (n1 + n2) - CAST(n2 AS DECIMAL(38,0)) * (a + b))
              * 1000000
              DIV (CAST(n2 AS DECIMAL(38,0)) * (a + b) * (n1 + n2))
          AS BIGINT)""").as("chi2_term_e6"))
      .orderBy("category")
  }

  /** Cross-snapshot CORRELATION DRIFT — did the RELATIONSHIP between two
    * document statistics change between corpus versions? The c6/c8/c9
    * family watches each distribution alone; a pipeline change that
    * starts padding short documents with boilerplate shifts the
    * quality↔length correlation while leaving either margin nearly
    * intact — this gate is the one that sees it. Reports Pearson r of
    * (quality micros, token count) per snapshot plus the absolute shift.
    *
    * The g4/v22 moment discipline: per side ONE combine-safe aggregate
    * of exact DECIMAL(38,0) sums (both inputs are exact longs — no
    * quantization step), one fixed-shape round-6 float ratio per side,
    * drift = |r₁ − r₂| of the ROUNDED values re-rounded (the c4 rule:
    * the gate reads only engine-identical numbers). A zero-variance
    * side reports null r and null drift — "undefined" and "no drift"
    * must not alias.
    *
    * Plan: one narrow codegen'd score pass + a 1-row scalar aggregate
    * per snapshot, a cross join of two 1-row tables — nothing shuffles
    * but the aggregate partials. Output: `(n_1, r_1, n_2, r_2, drift)`.
    */
  def correlationDrift(v1: DataFrame, v2: DataFrame): DataFrame =
    correlationReportFromMoments(correlationMoments(v1), correlationMoments(v2))

  /** One side's exact moment sums — the combine-safe half of
    * [[correlationDrift]], exposed so the STREAMED fold (e35) can land
    * per-batch deltas of the same six DECIMAL(38,0) statistics and re-sum
    * them order-free: counts and sums of exact longs and their products
    * are all Σ-mergeable, so fold(stream) ≡ batch bit-for-bit. Output:
    * one row `(m, sx, sy, sxy, sxx, syy)`.
    */
  def correlationMoments(df: DataFrame): DataFrame = {
    val d38 = "decimal(38,0)"
    val t = TextAnalysis.tokens(col("text"))
    df.select(TextAnalysis.qualityMicrosCol(t).as("x"),
        size(t).cast("long").as("y"))
      .agg(count(lit(1)).cast(d38).as("m"),
        sum(col("x").cast(d38)).as("sx"),
        sum(col("y").cast(d38)).as("sy"),
        sum(col("x").cast(d38) * col("y").cast(d38)).as("sxy"),
        sum(col("x").cast(d38) * col("x").cast(d38)).as("sxx"),
        sum(col("y").cast(d38) * col("y").cast(d38)).as("syy"))
  }

  /** The report half of [[correlationDrift]]: two 1-row moment tables
    * ([[correlationMoments]] schema, batch-aggregated or log-folded) →
    * the `(n_1, r_1, n_2, r_2, drift)` gate row. Shared by the batch
    * gate (c15) and the streamed fold (e35) so the two are equal BY
    * CONSTRUCTION, not by parallel reimplementation.
    */
  def correlationReportFromMoments(m1: DataFrame, m2: DataFrame): DataFrame = {
    def suffixed(df: DataFrame, suffix: String): DataFrame =
      df.select(col("m").as(s"m$suffix"), col("sx").as(s"sx$suffix"),
        col("sy").as(s"sy$suffix"), col("sxy").as(s"sxy$suffix"),
        col("sxx").as(s"sxx$suffix"), col("syy").as(s"syy$suffix"))
    def r(s: String) = when(
      col(s"m$s") * col(s"sxx$s") - col(s"sx$s") * col(s"sx$s") > 0 &&
        col(s"m$s") * col(s"syy$s") - col(s"sy$s") * col(s"sy$s") > 0,
      round((col(s"m$s") * col(s"sxy$s") - col(s"sx$s") * col(s"sy$s")).cast("double") /
        (sqrt((col(s"m$s") * col(s"sxx$s") - col(s"sx$s") * col(s"sx$s")).cast("double")) *
          sqrt((col(s"m$s") * col(s"syy$s") - col(s"sy$s") * col(s"sy$s")).cast("double"))), 6))
    suffixed(m1, "1").crossJoin(suffixed(m2, "2"))
      .select(col("m1").cast("long").as("n_1"), r("1").as("r_1"),
        col("m2").cast("long").as("n_2"), r("2").as("r_2"))
      .withColumn("drift", round(abs(col("r_1") - col("r_2")), 6))
  }

  /** Robust per-group OUTLIER gate: lower-median and MAD (median absolute
    * deviation) of a value column in exact integer cents, and the count of
    * rows beyond `k10/10 · MAD` of the median — the outlier detector that
    * survives what mean/stddev z-scores don't (a single corrupt 10¹²-cent
    * row drags a mean-based gate's own threshold past every real outlier;
    * the median doesn't move).
    *
    * Medians are LOWER medians — the value at rank `(n+1) div 2` of the
    * sorted group — picked over interpolation deliberately: an order
    * statistic is an exact integer BOTH engines agree on bit-for-bit,
    * where interpolated halves are floats (and the k-th order statistic is
    * deterministic under duplicate values even though row_number ties
    * aren't). The outlier test is the cross-multiplied integer compare
    * `dev·10 > MAD·k10` — no division anywhere.
    *
    * Plan shape: two window passes over the SAME hash-partitioning (group
    * key), each a sort within its group, then one aggregate. Exact
    * per-group medians fundamentally need the per-group sort — this is
    * the GATE-scale exact audit; the at-scale default for corpus-wide
    * monitoring is the mergeable KLL quantile sketch (c1/x17), which this
    * entry exists to hold honest (the t12/c1 exact/sketch discipline).
    *
    * Output: `(grp, n, med_cents, mad_cents, n_outliers)` ordered by grp.
    */
  def madOutliers(df: DataFrame, grpCol: String, valueCol: String,
                  k10: Long = 15L): DataFrame = {
    require(k10 > 0, s"k10 must be positive: $k10")
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy("cents")
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy("grp")
    val ranked = df.select(col(grpCol).as("grp"),
        expr(s"CAST(round($valueCol * 100) AS BIGINT)").as("cents"))
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
    // (n + 1) DIV 2, not `/`: Spark's `/` on longs is DOUBLE division, and
    // an even group's 3.5 would equal no integer rank — med silently null
    val withMed = ranked.withColumn("med_cents",
      max(when(col("rn") === expr("(n + 1) DIV 2"), col("cents"))).over(wAll))
    val wDev = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy("dev")
    val withMad = withMed
      .select(col("grp"), col("n"), col("med_cents"),
        abs(col("cents") - col("med_cents")).as("dev"))
      .withColumn("rn2", row_number().over(wDev))
      .withColumn("mad_cents",
        max(when(col("rn2") === expr("(n + 1) DIV 2"), col("dev"))).over(wAll))
    withMad.groupBy("grp")
      .agg(max("n").as("n"), max("med_cents").as("med_cents"),
        max("mad_cents").as("mad_cents"),
        sum(when(col("dev") * 10 > col("mad_cents") * k10, 1L).otherwise(0L))
          .as("n_outliers"))
      .orderBy("grp")
  }

  /** Per-group FRESHNESS report — "which slices of the catalog have gone
    * stale": newest record per group, staleness in whole days against the
    * corpus-wide newest record (the corpus's own high-water mark, NOT
    * wall-clock `now()` — a deterministic report must not change between
    * two runs over identical data), and a flag past `maxStaleDays`.
    * The ingest-health complement of [[volumeDrift]]: c5 watches how MUCH
    * arrives per day, this watches how RECENTLY each slice arrived at all.
    *
    * Plan: one map-side-combining (group, max) aggregate — the only
    * corpus-scale job — then the 1-row global max broadcast back as a
    * crossJoin (the c4 stats shape). Day arithmetic is exact integers.
    */
  def freshnessReport(df: DataFrame, grpCol: String, tsCol: String,
                      maxStaleDays: Int = 30): DataFrame =
    freshnessFromGroupMax(
      df.groupBy(col(grpCol).as("grp"))
        .agg(count(lit(1)).as("n"), max(to_date(col(tsCol))).as("max_day")),
      maxStaleDays)

  /** [[freshnessReport]] from an ALREADY-aggregated `(grp, n, max_day)`
    * table — the entry point the streaming twin (e32) folds its per-batch
    * (count, max) partial log into: counts are sum-mergeable and maxima
    * max-mergeable, so the fold is order-free and the shared report makes
    * stream ≡ batch by construction. The per-group table is materialized
    * EAGERLY before the high-water-mark branch — it is read twice (rows +
    * its own max), and without the cut each reference would re-run the
    * upstream aggregate.
    */
  def freshnessFromGroupMax(perGrpIn: DataFrame,
                            maxStaleDays: Int = 30): DataFrame = {
    require(maxStaleDays >= 0, s"maxStaleDays must be >= 0: $maxStaleDays")
    val perGrp = perGrpIn.localCheckpoint(true)
    perGrp
      .crossJoin(broadcast(perGrp.agg(max("max_day").as("corpus_max"))))
      .select(col("grp"), col("n"),
        col("max_day").cast("string").as("max_day"),
        datediff(col("corpus_max"), col("max_day")).cast("long")
          .as("stale_days"))
      // a group whose timestamps are ALL null has no newest record — that
      // is maximally stale, not unknown: flag TRUE (null stale_days kept
      // so the reader sees why)
      .withColumn("stale",
        coalesce(col("stale_days") > maxStaleDays, lit(true)))
      .orderBy("grp")
  }

  /** Join-key distribution profile: the `topK` heaviest keys with the
    * distributional context that decides a salting strategy —
    * `(key, cnt, n_keys, avg_cnt, p99_cnt, skew_ratio)` where
    * `skew_ratio = max/avg` and `p99_cnt` is the 99th percentile of
    * per-key counts. Deterministic order: cnt desc, key asc.
    *
    * Plan shape: per-key counts combine map-side (one shuffle of
    * (key, partial-count) rows, the only corpus-scale cost), the per-key
    * table is PERSISTED, and the scalar stats are ONE combine-safe
    * aggregate over it broadcast back as a single row (`crossJoin`).
    * No single-partition window anywhere: the per-key table is NOT
    * metadata-scale for exactly the keys this operator exists to diagnose
    * (a consumer-scale user-id or URL key has 10⁸–10⁹ distinct values,
    * and a `Window.partitionBy(lit(1))` over it would funnel every one
    * into a single task's sort — the d12/d13 straggler shape). The top-k
    * is a TakeOrdered merge, never a global sort; the persist means the
    * stats branch and the top-k branch both read the per-key AGGREGATE,
    * never the input twice.
    *
    * `exactP99 = true` computes the exact interpolated percentile (the
    * t14 `percentile` rank rule, value-checkable against any engine) —
    * still a combine-safe aggregate, but its state buffers the distinct
    * count-values, so it is the GATE-scale contract. The default is the
    * bounded-memory KLL-style `approx_percentile` sketch — the at-scale
    * twin (the t12/c1 exact/sketch discipline).
    *
    * The public form materializes the topK-row profile EAGERLY and
    * releases the per-key cache before returning (see
    * [[keySkewProfilePlanned]]) — perKey is corpus-KEY-cardinality-sized,
    * exactly the thing this operator diagnoses, so leaving it pinned
    * until session end would rely on LRU eviction under pressure.
    */
  def keySkewProfile(df: DataFrame, keyCol: String, topK: Int = 5,
                     exactP99: Boolean = false): DataFrame = {
    val (perKey, out) = keySkewProfilePlanned(df, keyCol, topK, exactP99)
    val materialized = out.localCheckpoint(true)
    perKey.unpersist()
    materialized
  }

  /** The lazy plan behind [[keySkewProfile]], exposed (with its persisted
    * per-key intermediate) so specs can pin the plan shape; callers of
    * this form own the cache lifecycle.
    */
  private[graft] def keySkewProfilePlanned(df: DataFrame, keyCol: String, topK: Int,
                                           exactP99: Boolean): (DataFrame, DataFrame) = {
    val perKey = df.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val p99 =
      if (exactP99) expr("percentile(cnt, 0.99)")
      else expr("approx_percentile(cnt, 0.99, 10000)").cast("double")
    val avgCnt = round(avg(col("cnt")), 6)
    val stats = perKey.agg(
      count(lit(1)).as("n_keys"),
      avgCnt.as("avg_cnt"),
      round(p99, 6).as("p99_cnt"),
      round(max(col("cnt")) / avgCnt, 6).as("skew_ratio"))
    val out = perKey
      .orderBy(col("cnt").desc, col("key"))
      .limit(topK)
      .crossJoin(broadcast(stats))
      .select("key", "cnt", "n_keys", "avg_cnt", "p99_cnt", "skew_ratio")
      .orderBy(col("cnt").desc, col("key")) // re-assert order above the join (topK rows)
    (perKey, out)
  }

  /** Per-source DATA CARD — the corpus-health artifact a training run
    * publishes alongside its model card: for every source, document and
    * token volume, mean quality, the Gopher-rule pass rate
    * ([[TextAnalysis.gopherRuleCols]] — the same predicates as t24, so
    * the rollup cannot drift from the per-doc report), and the exact-
    * duplicate rate (docs whose text md5 already appeared under a
    * smaller doc_id anywhere in the corpus — the d1 canonical rule).
    * Every statistic is exact integer arithmetic: mean quality is the
    * HALF_UP integer mean of the per-doc quality micros, the rates are
    * HALF_UP count/total micros (DECIMAL-scaled numerators, exact past
    * 2⁵³) — so the card is bit-identical on any engine and any
    * partitioning.
    *
    * Plan at 100 TB: ONE narrow map (tokens, micros, rules, md5) → ONE
    * md5-keyed exchange where a hash-partitioned window marks each row's
    * canonical minimum (group size = duplicate multiplicity, tiny and
    * uniform by construction — NOT a groupBy + join back, which
    * re-scans the corpus and re-runs the scoring map a second time:
    * measured 2 FileScans / 0 reuse on the join form) → the
    * |sources|-row aggregate, map-side combining. Nothing corpus-scale
    * ever sits on the driver; one-scan/one-hash-exchange plan-pinned.
    */
  def dataCard(docs: DataFrame): DataFrame = {
    val t = TextAnalysis.tokens(col("text"))
    val pass = TextAnalysis.gopherRuleCols(col("text")).map(_._2).reduce(_ && _)
    val base = docs.select(col("doc_id"), col("source"),
      size(t).cast("long").as("n_tok"),
      TextAnalysis.qualityMicrosCol(t).as("qm"),
      when(pass, 1L).otherwise(0L).as("gp"),
      md5(col("text")).as("h"))
    val hmin = min(col("doc_id")).over(
      org.apache.spark.sql.expressions.Window.partitionBy("h"))
    val flagged = base
      .select(col("source"), col("n_tok"), col("qm"), col("gp"),
        when(col("doc_id") =!= hmin, 1L).otherwise(0L).as("dup"))
    // HALF_UP integer division of scale·num/den with the scaling done in
    // DECIMAL (exact past the 2^53/2^63 windows at corpus-scale sums)
    def divHalfUp(num: Column, den: Column, scale: Long): Column = {
      val scaled = lit(scale).cast("decimal(38,0)") * num + shiftright(den, 1)
      ((scaled - pmod(scaled, den)) / den).cast("long")
    }
    flagged.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"),
        sum("qm").as("__sq"), sum("gp").as("__sgp"), sum("dup").as("__sdup"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        divHalfUp(col("__sq"), col("n_docs"), 1L).as("mean_quality_micros"),
        divHalfUp(col("__sgp"), col("n_docs"), 1000000L).as("gopher_pass_micros"),
        divHalfUp(col("__sdup"), col("n_docs"), 1000000L).as("exact_dup_micros"))
      .orderBy("source")
  }

  /** QUALITY-DISTRIBUTION drift between two corpus snapshots — the
    * population-stability report a training pipeline runs before letting
    * a new corpus version feed a run: per-bucket document counts and
    * fractions of the quality score, side by side, with the absolute
    * per-bucket shift. A curation change that silently moves mass
    * between quality deciles shows up here before it shows up in a
    * trained model.
    *
    * Everything is exact integers: the bucket is the quality MICROS
    * integer floor-divided into `buckets` equal slices (micros = 10⁶
    * lands in the top bucket), fractions are the HALF_UP micros of
    * count/total (the [[TextAnalysis.roundDiv6]] integer form), and the
    * drift is a difference of those longs — so the report is
    * bit-identical on any engine and any partitioning, and a zero-drift
    * bucket is exactly zero, never 1e-16. Empty buckets are DENSIFIED
    * over a bucket spine (the volumeDrift calendar-spine rule): a decile
    * both snapshots vacate still appears, showing 0/0 rather than
    * vanishing from the report.
    *
    * At 100 TB: each side is one narrow tokenize/score/bucket pass into
    * a `buckets`-row map-side-combining aggregate (union-tagged, ONE
    * shuffle for both sides); totals are part of the same aggregate
    * output folded on the driver-free spine join — all downstream work
    * is metadata-scale.
    */
  def qualityDrift(v1: DataFrame, v2: DataFrame, buckets: Int = 10): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val micros = TextAnalysis.qualityMicrosCol(TextAnalysis.tokens(col("text")))
    val scaledB = micros * lit(buckets.toLong)
    val bucket = least(lit(buckets - 1L),
      ((scaledB - pmod(scaledB, lit(1000000L))) / lit(1000000L)).cast("long"))
    def side(df: DataFrame, one: Long, two: Long): DataFrame =
      df.select(bucket.as("bucket"), lit(one).as("one"), lit(two).as("two"))
    val counts = side(v1, 1L, 0L).unionByName(side(v2, 0L, 1L))
      .groupBy("bucket")
      .agg(sum("one").as("n_v1"), sum("two").as("n_v2"))
    val totals = counts.agg(sum("n_v1").as("t1"), sum("n_v2").as("t2"))
    val spine = v1.sparkSession.range(buckets).select(col("id").as("bucket"))
    // scaled numerator in DECIMAL so the fraction stays exact past the
    // 2^53 double window (corpus counts can exceed it; bucket indices not)
    def fracMicros(n: Column, t: Column): Column = {
      val scaled = lit(1000000L).cast("decimal(38,0)") * n + shiftright(t, 1)
      ((scaled - pmod(scaled, t)) / t).cast("long")
    }
    val f1 = fracMicros(col("n_v1"), col("t1"))
    val f2 = fracMicros(col("n_v2"), col("t2"))
    spine.join(counts, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("n_v1"), lit(0L)).as("n_v1"),
        coalesce(col("n_v2"), lit(0L)).as("n_v2"))
      .crossJoin(broadcast(totals))
      .select(col("bucket"), col("n_v1"), col("n_v2"),
        f1.as("f1_micros"), f2.as("f2_micros"),
        abs(f1 - f2).as("drift_micros"))
      .orderBy("bucket")
  }

  /** POPULATION STABILITY INDEX over the [[qualityDrift]] bucket table —
    * the industry single-number drift alarm (model-monitoring convention:
    * PSI < 0.1 stable, 0.1–0.25 moderate shift, > 0.25 major shift —
    * the thresholds every scorecard-monitoring text publishes):
    *
    *   PSI = Σ_buckets (f1 − f2) · ln(f1 / f2)
    *
    * with both fractions Laplace-shifted by `epsMicros` (default 10⁻⁴) so
    * a vacated bucket contributes a finite penalty instead of ±∞ — the
    * standard smoothing. Inputs are c6's EXACT micros fractions, so the
    * only float steps are the final per-bucket products and `ln` (libm
    * ulp + a ≤`buckets`-term sum reorder, both far inside the round-4
    * output — the t11 rule). The alert level derives from the ROUNDED
    * value in both engines, so the compare never straddles an ulp.
    * Cost: c6's one union-tagged pass + a `buckets`-row fold.
    */
  def psiDrift(v1: DataFrame, v2: DataFrame, buckets: Int = 10,
               epsMicros: Long = 100L): DataFrame =
    psiFromCounts(qualityBucketCounts(v1, buckets),
      qualityBucketCounts(v2, buckets), buckets, epsMicros)

  /** Per-decile quality-bucket counts: (bucket, n) — the SUM-MERGEABLE
    * statistic behind the PSI family: per-batch bucket counts fold by
    * plain addition, which is what lets a STREAM keep the drift alarm
    * current (e28 rides the e15/e27 sum-log discipline on exactly this
    * table). One narrow tokenize/score/bucket pass, `buckets`-row output.
    */
  def qualityBucketCounts(df: DataFrame, buckets: Int = 10): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val micros = TextAnalysis.qualityMicrosCol(TextAnalysis.tokens(col("text")))
    val scaledB = micros * lit(buckets.toLong)
    val bucket = least(lit(buckets - 1L),
      ((scaledB - pmod(scaledB, lit(1000000L))) / lit(1000000L)).cast("long"))
    df.select(bucket.as("bucket")).groupBy("bucket").agg(count(lit(1)).as("n"))
  }

  /** PSI from two (bucket, n) count tables — [[psiDrift]]'s fold half,
    * callable on a STREAM-FOLDED count table (e28): densify both sides
    * over the bucket spine, exact HALF_UP micros fractions (DECIMAL-
    * scaled numerators, the qualityDrift rule), then the smoothed PSI
    * with the alert level derived from the ROUNDED value.
    */
  def psiFromCounts(counts1: DataFrame, counts2: DataFrame,
                    buckets: Int = 10, epsMicros: Long = 100L): DataFrame = {
    val spine = counts1.sparkSession.range(buckets).select(col("id").as("bucket"))
    val m = spine
      .join(counts1.select(col("bucket"), col("n").as("n_v1")), Seq("bucket"), "left")
      .join(counts2.select(col("bucket"), col("n").as("n_v2")), Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("n_v1"), lit(0L)).as("n_v1"),
        coalesce(col("n_v2"), lit(0L)).as("n_v2"))
    val totals = m.agg(sum("n_v1").as("t1"), sum("n_v2").as("t2"))
    def fracMicros(n: Column, t: Column): Column = {
      val scaled = lit(1000000L).cast("decimal(38,0)") * n + shiftright(t, 1)
      ((scaled - pmod(scaled, t)) / t).cast("long")
    }
    val withF = m.crossJoin(broadcast(totals))
      .select(fracMicros(col("n_v1"), col("t1")).as("f1m"),
        fracMicros(col("n_v2"), col("t2")).as("f2m"))
    val f1 = (col("f1m") + epsMicros).cast("double") / 1000000.0
    val f2 = (col("f2m") + epsMicros).cast("double") / 1000000.0
    withF.agg(round(sum((f1 - f2) * log(f1 / f2)), 4).as("psi"))
      .select(col("psi"),
        when(col("psi") > 0.25, "major")
          .when(col("psi") > 0.1, "moderate")
          .otherwise("stable").as("level"))
  }

  /** Two-sample KOLMOGOROV–SMIRNOV statistic over a numeric column — the
    * binning-free companion of [[psiDrift]] (PSI answers "did the decile
    * masses move", KS answers "what is the largest CDF gap anywhere"):
    *
    *   D = max_x |F_a(x) − F_b(x)|
    *
    * carried EXACTLY in integers: with cumulative counts C_a, C_b and
    * totals n_a, n_b, the gap at x is |C_a·n_b − C_b·n_a| / (n_a·n_b),
    * so the max runs on the integer numerator and the single reported
    * fraction is one floor division to micros — no float ever compares,
    * and the oracle's naive global window reproduces the value
    * bit-for-bit.
    *
    * Scale shape — the distributed prefix sum (the textbook two-pass):
    * values collapse to distinct-value counts in ONE union-tagged
    * map-side-combining aggregate; each value lands in one of
    * `rangeBuckets` ORDER-PRESERVING range buckets (boundaries from a
    * 1-row min/max aggregate, broadcast); the running sums are
    * per-bucket windows (distributed — each bucket sorts only its own
    * slice) plus a bucket-offset table of `rangeBuckets` rows whose own
    * prefix window is metadata-scale (the j9 |steps|-window precedent).
    * No global single-partition sort ever happens — the c4 lesson
    * applied to the ECDF.
    */
  def ksDrift(a: DataFrame, b: DataFrame, valueCol: String = "value",
              rangeBuckets: Int = 1024): DataFrame = {
    require(rangeBuckets > 0, s"rangeBuckets must be positive, got $rangeBuckets")
    import org.apache.spark.sql.expressions.Window
    def side(df: DataFrame, ca: Long, cb: Long): DataFrame =
      df.select(col(valueCol).cast("double").as("v"),
        lit(ca).as("one_a"), lit(cb).as("one_b"))
    val g = side(a, 1L, 0L).unionByName(side(b, 0L, 1L))
      .where(col("v").isNotNull)
      .groupBy("v").agg(sum("one_a").as("ca"), sum("one_b").as("cb"))
    val bounds = g.agg(min("v").as("lo"), max("v").as("hi"))
    // order-preserving range bucket; engine-internal only (the result is
    // bucket-assignment-independent), so float boundary math is safe
    val span = col("hi") - col("lo")
    val bucket = when(span === 0.0, lit(0L)).otherwise(
      least(lit(rangeBuckets - 1L),
        floor((col("v") - col("lo")) / span * rangeBuckets).cast("long")))
    val gb = g.crossJoin(broadcast(bounds)).select(col("v"), col("ca"),
      col("cb"), bucket.as("bkt"))
    val inW = Window.partitionBy("bkt").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offW = Window.orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = gb.groupBy("bkt")
      .agg(sum("ca").as("ba"), sum("cb").as("bb"))
      .select(col("bkt"),
        coalesce(sum("ba").over(offW), lit(0L)).as("off_a"),
        coalesce(sum("bb").over(offW), lit(0L)).as("off_b"))
    val cum = gb
      .select(col("bkt"), col("v"), sum("ca").over(inW).as("ia"),
        sum("cb").over(inW).as("ib"))
      .join(broadcast(offsets), "bkt")
      .select((col("ia") + col("off_a")).as("cum_a"),
        (col("ib") + col("off_b")).as("cum_b"))
    val totals = g.agg(sum("ca").as("n_a"), sum("cb").as("n_b"))
    // cross-count products in DECIMAL: n_a·n_b overflows a long first,
    // two decades before anything else here does (the fracMicros rule)
    val dec = "decimal(38,0)"
    cum.crossJoin(broadcast(totals))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        max(abs(col("cum_a").cast(dec) * col("n_b") -
          col("cum_b").cast(dec) * col("n_a"))).as("d_dec"))
      .select(col("n_a"), col("n_b"), col("d_dec"),
        (lit(1000000L).cast(dec) * col("d_dec")).as("scaled"),
        (col("n_a").cast(dec) * col("n_b")).as("den"))
      .select(col("n_a"), col("n_b"), col("d_dec").cast("long").as("d_num"),
        ((col("scaled") - pmod(col("scaled"), col("den"))) / col("den"))
          .cast("long").as("ks_micros"))
  }

  /** FUNCTIONAL-DEPENDENCY check — the schema-contract audit beside
    * [[constraintChecks]]' row predicates (Deequ's Uniqueness/FD class):
    * for each declared dependency A→B, does every determinant value map
    * to ONE dependent value? A violated id→title says the key isn't a
    * key; a violated category→format quantifies how far a believed
    * 1:1 taxonomy actually branches — the statistic behind join-key
    * trust and dimension-table normalization decisions.
    *
    * Per FD: determinant-group count, groups with > 1 distinct
    * dependent (the violations), the widest branch, and the violation
    * share in DECIMAL-widened floor-div ppm. Dependent NULLs don't
    * count as a branch (count-distinct semantics, mirrored exactly by
    * the oracle); a NULL determinant forms its own group (it can still
    * branch). All declared FDs melt through ONE struct-array explode
    * into a single two-level aggregate (the c16 one-pass melt rule —
    * never a job per FD), both levels map-side-combining. Output:
    * `(fd, n_det, n_violating, max_branches, violation_ppm)` by fd.
    */
  def fdCheck(df: DataFrame, fds: Seq[(String, String)]): DataFrame =
    fdReportFromTriples(fdTriples(df, fds))

  /** The melt half: every declared FD's (fd, det, dep) triples off ONE
    * struct-array explode. The DISTINCT triple set is union-mergeable
    * (the e31 set-log argument — order-free AND duplicate-delivery-
    * immune), which is what the streamed fold (e41) lands per batch;
    * [[fdReportFromTriples]] is insensitive to duplicate triples
    * (count-distinct + group existence), so the same report stage serves
    * the raw batch melt and the folded set log unchanged.
    */
  def fdTriples(df: DataFrame, fds: Seq[(String, String)]): DataFrame = {
    require(fds.nonEmpty, "fdCheck needs at least one declared dependency")
    val names = fds.map { case (a, b) => s"$a->$b" }
    require(names.distinct.size == names.size, s"duplicate FDs: $names")
    df.select(explode(array(fds.map { case (det, dep) =>
        struct(lit(s"$det->$dep").as("fd"),
          col(det).cast("string").as("det"),
          col(dep).cast("string").as("dep"))
      }: _*)).as("kv"))
      .select(col("kv.fd").as("fd"), col("kv.det").as("det"), col("kv.dep").as("dep"))
  }

  /** The report half: two-level map-side-combining aggregate over
    * triples — one aggregate's worth or a folded log's (stream ≡ batch
    * because duplicates cannot change count-distinct or group
    * existence). */
  def fdReportFromTriples(melted: DataFrame): DataFrame =
    melted.groupBy("fd", "det").agg(countDistinct(col("dep")).as("nd"))
      .groupBy("fd").agg(
        count(lit(1)).as("n_det"),
        sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_violating"),
        max("nd").as("max_branches"))
      .withColumn("violation_ppm",
        expr("CAST(n_violating AS DECIMAL(38,0)) * 1000000 DIV n_det"))
      .select("fd", "n_det", "n_violating", "max_branches", "violation_ppm")
      .orderBy("fd")

  /** Benford's-law expected first-digit shares in micros — LITERAL
    * constants, never a runtime log10 (the t20 no-libm rule: both
    * engines must read the identical table); log10(1 + 1/d) for
    * d = 1..9, rounded half-up to micros. The rounded row sums to
    * EXACTLY 10⁶, so dev_e6 across digits sums to −(share remainder)
    * ∈ (−9, 0] micros of floor-div loss only.
    */
  private[graft] val BenfordE6: Seq[Long] =
    Seq(301030L, 176091L, 124939L, 96910L, 79181L, 66947L, 57992L, 51153L, 45757L)

  /** BENFORD first-digit profile — the fabricated-data / unit-mix screen
    * run on any positive magnitude-spanning numeric column (record
    * counts, sizes, revenues): organic multiplicative data follows
    * log10(1 + 1/d) first-digit shares; padded, invented, or
    * constant-injected columns do not, and the per-digit deviation says
    * WHICH digit band is off (the classic forensic-accounting screen,
    * here as a catalog-quality gate beside c11's MAD outliers).
    *
    * Exact integers end to end: the first significant digit of a
    * positive integer is its leading decimal character (no float log),
    * observed shares floor-divide to micros (DECIMAL-widened product —
    * count·10⁶ at corpus scale brushes a long), expectations are the
    * [[BenfordE6]] literals, dev_e6 their signed difference. Non-positive
    * values are excluded (Benford is undefined there — documented, not
    * silent: the row count says how many survived). One
    * map-side-combining 9-bucket aggregate over a narrow projection +
    * a 9-row literal spine join — nothing corpus-scale shuffles. Missing
    * digits surface as 0-count rows (absence IS the signal for a
    * truncated distribution). Output: `(digit, n_obs, share_e6,
    * benford_e6, dev_e6)` for d = 1..9 ordered by digit.
    */
  def benfordProfile(df: DataFrame, valueCol: String): DataFrame = {
    val pos = df.where(col(valueCol) > 0)
    require(!pos.isEmpty,
      s"benfordProfile: no positive values in $valueCol — no shares exist")
    benfordFromCounts(benfordDigitCounts(pos, valueCol))
  }

  /** The per-digit observed counts — one map-side-combining 9-bucket
    * aggregate over positive values. Sum-mergeable (the e15 rule), which
    * is what the streamed fold (e40) lands per batch; [[benfordFromCounts]]
    * over the folded rows equals the batch profile by construction.
    */
  def benfordDigitCounts(pos: DataFrame, valueCol: String): DataFrame =
    pos.where(col(valueCol) > 0)
      .select(substring(col(valueCol).cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n_obs"))

  /** The report half: re-sum (digit, n_obs) rows — one aggregate's or a
    * folded log's — onto the literal spine. Shared so stream ≡ batch.
    */
  def benfordFromCounts(countsIn: DataFrame): DataFrame = {
    val counts = countsIn.groupBy("digit").agg(sum("n_obs").as("n_obs"))
    val spine = countsIn.sparkSession.range(1, 10)
      .select(col("id").cast("int").as("digit"),
        element_at(typedLit(BenfordE6), col("id").cast("int")).as("benford_e6"))
    spine.join(counts, Seq("digit"), "left")
      .crossJoin(broadcast(counts.agg(sum("n_obs").as("n_total"))))
      .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
      .withColumn("share_e6",
        expr("CAST(n_obs AS DECIMAL(38,0)) * 1000000 DIV n_total"))
      .withColumn("dev_e6", col("share_e6") - col("benford_e6"))
      .select("digit", "n_obs", "share_e6", "benford_e6", "dev_e6")
      .orderBy("digit")
  }
}
