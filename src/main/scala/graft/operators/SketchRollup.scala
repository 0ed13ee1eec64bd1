package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable-sketch rollups — the pre-aggregation pattern that answers
  * "how many distinct users in ANY date range?" without ever rescanning
  * the event corpus. A plain `count(distinct)` is not mergeable: each new
  * range query is a full scan + exact-distinct shuffle over the raw rows.
  * A Datasketches HLL sketch IS mergeable (union is idempotent,
  * associative, order-independent), so the corpus is folded ONCE into
  * per-day sketches — a few KB per day regardless of row count — and any
  * range thereafter is a union-merge over the selected days' sketch rows.
  *
  * At 100 TB: the daily fold is one map-side-combining aggregate (sketch
  * partials combine within each scan task before the tiny per-day
  * exchange); the persisted rollup is days × KB — driver-browsable for a
  * century of data — and a range query reads |days| sketch rows instead
  * of the corpus, turning an O(corpus) exact-distinct rescan into O(days)
  * bytes. Estimate error is the standard HLL bound (~1.04/√2^lgK ≈ 1.6%
  * at lgConfigK = 12); the registered entry gates the estimate against
  * the EXACT distinct cross-engine at a 5% tolerance.
  *
  * Built entirely on Spark's public Datasketches functions
  * (`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`) — the
  * sketches are deterministic for a given input multiset, so the rollup
  * reproduces bit-for-bit on any partitioning.
  */
object SketchRollup {

  /** Fold an event table into one HLL sketch row per day:
    * `(day, sketch, n_events)`. The sketch column is the serialized
    * Datasketches HLL union of the day's `keyCol` values.
    */
  def dailyDistinctSketches(events: DataFrame, tsCol: String, keyCol: String,
                            lgConfigK: Int = 12): DataFrame =
    events.groupBy(to_date(col(tsCol)).as("day"))
      .agg(hll_sketch_agg(col(keyCol), lit(lgConfigK)).as("sketch"),
        count(lit(1)).as("n_events"))

  /** Distinct-count estimate for `[from, to)` from a persisted daily
    * rollup: union-merge the selected days' sketches, estimate once.
    * Reads |days| sketch rows — never the event corpus.
    */
  def rangeDistinctEstimate(sketches: DataFrame, from: String, to: String): DataFrame =
    sketches.where(col("day") >= lit(from) && col("day") < lit(to))
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"), lit(false)))
        .as("est_distinct"))

  /** The QUANTILE twin of [[dailyDistinctSketches]]: one Datasketches KLL
    * doubles sketch of `valCol` per day — "what is the p95 of `value` over
    * ANY date range?" without rescanning the corpus. KLL is mergeable the
    * same way HLL is, and its guarantee is on RANK, not value: at k = 400
    * the normalized rank error is ≈ 0.9% (99% conf.), so the registered
    * entry gates the merged estimate by the exact rank of the returned
    * value, not by value distance (value error is distribution-dependent;
    * rank error is not). KLL compaction is randomized — estimates vary
    * bit-level across runs within the rank bound — so entries must never
    * hash-gate the raw estimate, only exact values plus rank-tolerance
    * booleans ([[SketchRollup]]'s x16 gating discipline). `n` per sketch
    * IS deterministic and pins merge ≡ one-shot in the spec.
    */
  def dailyQuantileSketches(events: DataFrame, tsCol: String, valCol: String,
                            k: Int = 400): DataFrame =
    events.groupBy(to_date(col(tsCol)).as("day"))
      .agg(kll_sketch_agg_double(col(valCol), k).as("sketch"),
        count(lit(1)).as("n_events"))

  /** Quantile estimates for `[from, to)` from a persisted daily KLL
    * rollup: merge the selected days' sketches once, then read each
    * requested quantile from the merged sketch. Output one row:
    * `(n, est_q<percent> ...)`. Reads |days| sketch rows.
    */
  def rangeQuantileEstimate(sketches: DataFrame, from: String, to: String,
                            qs: Seq[Double], k: Int = 400): DataFrame = {
    val merged = sketches.where(col("day") >= lit(from) && col("day") < lit(to))
      .agg(kll_merge_agg_double(col("sketch"), k).as("m"))
    merged.select(
      kll_sketch_get_n_double(col("m")).as("n") +:
      qs.map(q => kll_sketch_get_quantile_double(col("m"), lit(q))
        .as(s"est_q${(q * 100).round}")): _*)
  }

  /** The SET-OPERATION tier HLL cannot provide: Datasketches THETA
    * sketches support intersection and difference, so a per-day theta
    * rollup answers RETENTION ("how many users active in range A were
    * still active in range B?") and CHURN (A \ B) from sketch rows alone.
    * Same mergeable-fold shape as [[dailyDistinctSketches]]; theta hashing
    * is seed-fixed and deterministic, and below the nominal-entries
    * threshold (4096 at the default lgK = 12) the sketch holds every hash
    * — exact mode — so intersection estimates carry no sampling error
    * until daily distincts exceed that. The registered entry still gates
    * against the EXACT intersection/difference cross-engine, the x16 rule.
    */
  def dailyThetaSketches(events: DataFrame, tsCol: String, keyCol: String): DataFrame =
    events.groupBy(to_date(col(tsCol)).as("day"))
      .agg(theta_sketch_agg(col(keyCol)).as("sketch"),
        count(lit(1)).as("n_events"))

  /** Retention + churn estimates between ranges `[aFrom, aTo)` and
    * `[bFrom, bTo)` from a persisted daily theta rollup: union each
    * range's day sketches, then one row
    * `(est_a, est_b, est_retained, est_churned)` via theta intersection /
    * difference on the two merged sketches. Reads |days| sketch rows —
    * the raw corpus is never consulted.
    */
  def rangeRetentionEstimate(sketches: DataFrame,
                             aFrom: String, aTo: String,
                             bFrom: String, bTo: String): DataFrame = {
    def rangeUnion(from: String, to: String, as: String) =
      sketches.where(col("day") >= lit(from) && col("day") < lit(to))
        .agg(theta_union_agg(col("sketch")).as(as))
    rangeUnion(aFrom, aTo, "a").crossJoin(rangeUnion(bFrom, bTo, "b"))
      .select(
        theta_sketch_estimate(col("a")).as("est_a"),
        theta_sketch_estimate(col("b")).as("est_b"),
        theta_sketch_estimate(theta_intersection(col("a"), col("b"))).as("est_retained"),
        theta_sketch_estimate(theta_difference(col("a"), col("b"))).as("est_churned"))
  }

  // ------------------------------------------------------------ heavy hitters

  /** The HEAVY-HITTERS tier of the rollup family — the fourth mergeable
    * summary beside distincts (x16/HLL), quantiles (x17/KLL), and set
    * operations (x18/theta): "top-k keys by count over ANY date range"
    * answered from per-day candidate rows, never a corpus rescan.
    *
    * Per-day summary = the day's EXACT per-key counts pruned to the top
    * `m` (count desc, key asc — deterministic), each row carrying the
    * day's `residual_max`: the largest PRUNED count (0 when nothing was
    * pruned). That pair is exactly a deterministic SpaceSaving-style
    * summary with a per-day error certificate: a key absent from a day's
    * candidates had at most `residual_max` occurrences that day, so any
    * range merge can bound what pruning may have hidden — unlike a raw
    * "keep top m" truncation, which loses silently.
    *
    * Plan shape: one map-side-combining aggregate to (day, key) counts,
    * one per-day window for the prune (keys hash-spread, per-day state is
    * the day's key count), and the summary is ≤ m+ε rows × KB per day.
    * At 100 TB the corpus folds ONCE; every subsequent range query reads
    * |days|·m candidate rows.
    */
  /** Exact per-(day, key) counts — the UNPRUNED statistic under the
    * heavy-hitters rollup. Counts are sum-mergeable (order-free, exact),
    * so count tables from disjoint slices of the corpus — per-ingest-batch
    * deltas, per-partition folds — combine by plain re-aggregation
    * ([[candidatesFromCountLog]]): the e14/e15 log-of-partials algebra on
    * an exact statistic.
    */
  def dailyKeyCounts(events: DataFrame, tsCol: String, keyCol: String): DataFrame =
    events.groupBy(to_date(col(tsCol)).as("day"), col(keyCol).as("key"))
      .agg(count(lit(1)).as("cnt"))

  /** Prune a (day, key, cnt) table to each day's top `m` (count desc, key
    * asc — deterministic) with the day's residual ceiling attached. The
    * prune must see a day's COMPLETE counts — prune a partial slice and
    * the residual certificate lies — so it runs at summary-build (or
    * log-compaction) time, never per ingest batch.
    */
  def pruneTopM(counts: DataFrame, m: Int): DataFrame = {
    require(m >= 1, s"m must be >= 1: $m")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("day")).orderBy(col("cnt").desc, col("key"))
    val ranked = counts.withColumn("_rn", row_number().over(w))
    val kept = ranked.where(col("_rn") <= m).drop("_rn")
    val residual = ranked.where(col("_rn") > m)
      .groupBy("day").agg(max(col("cnt")).as("residual_max"))
    kept.join(residual, Seq("day"), "left")
      .withColumn("residual_max", coalesce(col("residual_max"), lit(0L)))
  }

  def dailyTopKCandidates(events: DataFrame, tsCol: String, keyCol: String,
                          m: Int): DataFrame =
    pruneTopM(dailyKeyCounts(events, tsCol, keyCol), m)

  /** Candidate summary from a COUNT-DELTA LOG (per-batch
    * [[dailyKeyCounts]] tables, e.g. the streaming fold's `batch=<id>/`
    * directories): re-sum to complete per-(day, key) counts — exact in
    * ANY fold order — then prune once. Batches are day-disjoint or not;
    * it does not matter, summation restores the full counts either way.
    */
  def candidatesFromCountLog(log: DataFrame, m: Int): DataFrame =
    pruneTopM(log.groupBy(col("day"), col("key"))
      .agg(sum(col("cnt")).as("cnt")), m)

  /** Range top-k from a persisted daily candidate rollup, with the merged
    * error certificate made explicit per returned row:
    *
    *  - `cnt_lb`: the key's summed candidate counts — a LOWER bound on
    *    its true range count (pruned days contributed nothing).
    *  - `cnt_ub`: `cnt_lb` + the residual ceilings of selected days where
    *    the key was NOT a candidate — the matching upper bound.
    *  - `guaranteed`: this row's `cnt_lb` ≥ every non-returned key's
    *    `cnt_ub` (including the all-days-pruned phantom, whose bound is
    *    the full residual sum) — when true, the row is PROVABLY in a
    *    true top-k (ties at the boundary resolved either way), not an
    *    artifact of pruning. With `m` at/above the
    *    day's key cardinality every residual is 0, bounds collapse to the
    *    exact count, and every row is guaranteed — the gate-scale
    *    configuration the oracle value-checks; tight `m` trades summary
    *    bytes for certificate slack, never for silent wrongness.
    *
    * Everything is integer arithmetic over ≤ |days|·m candidate rows —
    * deterministic on any partitioning and any engine.
    */
  def rangeTopK(candidates: DataFrame, from: String, to: String,
                k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val sel = candidates.where(col("day") >= lit(from) && col("day") < lit(to))
    // total residual ceiling across the selected days (one row per day)
    val totalRes = sel.select(col("day"), col("residual_max")).distinct()
      .agg(coalesce(sum(col("residual_max")), lit(0L)).as("_total_res"))
    val perKey = sel.groupBy(col("key"))
      .agg(sum(col("cnt")).as("cnt_lb"),
        sum(col("residual_max")).as("_present_res"))
      .crossJoin(broadcast(totalRes))
      .withColumn("cnt_ub",
        col("cnt_lb") + (col("_total_res") - col("_present_res")))
    val byCount = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt_lb").desc, col("key"))
    val ranked = perKey.withColumn("_rn", row_number().over(byCount))
    // the strongest competing upper bound among keys NOT returned — the
    // ranked tail's max cnt_ub, or the phantom key every day pruned
    // (cnt_ub = total residual sum) when the tail is empty
    val rival = ranked.where(col("_rn") > k)
      .agg(max(col("cnt_ub")).as("_rival_ub"))
      .crossJoin(broadcast(totalRes))
      .select(greatest(coalesce(col("_rival_ub"), lit(0L)),
        col("_total_res")).as("_rival"))
    ranked.where(col("_rn") <= k)
      .crossJoin(broadcast(rival))
      .select(col("key"), col("cnt_lb"), col("cnt_ub"),
        (col("cnt_lb") >= col("_rival")).as("guaranteed"))
      .orderBy(col("cnt_lb").desc, col("key"))
  }
}
