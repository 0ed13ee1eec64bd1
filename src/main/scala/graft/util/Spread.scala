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
}
