package graft.util

import org.apache.spark.sql.DataFrame

/** Lineage-cut strategy for iterative algorithms and post-streaming
  * snapshots — the places a plan must be materialized and its history
  * dropped (e.g. the label frontier of a connected-components loop, whose
  * lineage would otherwise deepen every round).
  *
  * Two strategies, chosen by cluster configuration:
  *
  *  - `localCheckpoint()` — blocks live in executor block storage. Fast
  *    (no replicated write), but NOT cluster-safe: executor loss or dynamic
  *    deallocation silently destroys the blocks and any job that still
  *    needs them dies mid-iteration.
  *  - reliable `checkpoint()` — materializes to the context's configured
  *    checkpoint directory (HDFS/object store on a real cluster), surviving
  *    executor churn. The right default whenever a checkpoint dir is set.
  *
  * [[cut]] picks reliable automatically when `spark.sparkContext
  * .getCheckpointDir` is configured and falls back to local otherwise
  * (single-JVM runs: tests, bench, local verify). Callers that need a
  * specific behavior pass a strategy explicitly (both operators and the
  * streaming harness take a `cut: DataFrame => DataFrame` parameter).
  */
object LineageCut {

  /** Auto strategy: reliable when the context has a checkpoint dir. */
  def cut(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) reliable(df)
    else local(df)

  /** Reliable checkpoint — requires `sparkContext.setCheckpointDir`. */
  def reliable(df: DataFrame): DataFrame = df.checkpoint()

  /** Executor-local checkpoint — fast, lost on executor failure. */
  def local(df: DataFrame): DataFrame = df.localCheckpoint()
}
