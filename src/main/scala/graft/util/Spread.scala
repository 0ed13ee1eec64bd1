package graft.util

import org.apache.spark.sql.{Column, DataFrame}

/** Core-count-pinned repartition for cheap-bytes/expensive-compute barriers
  * (r17). AQE's partition coalescing sizes post-shuffle partitions by the
  * bytes that crossed the wire — the right call when downstream cost is
  * proportional to those bytes, and exactly wrong for a kB-scale exchange
  * feeding a stage whose per-row cost fans out (tokenize→shingle over raw
  * text, d² dimension-pair expansion, signature banding): the coalescer
  * folds the exchange into one partition and serializes the expensive
  * stage on one core (measured: v22's moment stage 3.9 s single-task vs
  * 0.5 s spread at sf0.1/32).
  *
  * Pinning the partition count to `defaultParallelism` keeps the choice
  * scale-adaptive — it follows the cluster's core count on any deployment,
  * it is never a constant tuned for one machine — and an explicit-count
  * repartition is exempt from AQE coalescing by contract, so the spread
  * survives. The keyed overload keeps rows of one key together (the
  * ReuseExchange/join-alignment property the callers rely on).
  */
object Spread {
  def byKey(df: DataFrame, key: Column): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, key)

  /** Scan-parallelism guard for compute-heavy single-table pipelines:
    * repartition to core count ONLY when the scan's own split count is
    * below it. Parquet splits cannot go finer than row groups, so a table
    * written as a few row groups caps every downstream stage's parallelism
    * regardless of config (guide §2.5 "input skew: repartition immediately
    * after the read") — measured: the o6 rollup's join+expand+decimal
    * aggregate ran 1.9 s on the 3 tasks the lineitem layout allows vs
    * ~0.3 s spread. At scale the condition is false (a real table scans as
    * thousands of splits) and this is a no-op — the adaptivity is the
    * point: never a constant, never a blanket shuffle.
    *
    * Usage contract (r18, from the r17 advice): apply this to a
    * freshly-read scan (or a narrow projection of one) — the probe reads
    * `df.rdd.getNumPartitions`, which physically plans the frame once at
    * construction time; that is the intended cost for a scan, but the
    * method is not meant for frames with exchanges already inside them.
    */
  def scanWide(df: DataFrame, key: Column): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < cores) df.repartition(cores, key) else df
  }
}
