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
}
