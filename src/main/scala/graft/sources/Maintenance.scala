package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table-maintenance operations a long-lived 100 TB corpus needs: reading
  * across schema generations, and re-sizing the physical file layout.
  * Both are storage-layer concerns the reference delegates to Elasticsearch
  * (mappings evolve in place, segments merge in the background,
  * `/root/reference/data_catalog/app.py:89-112` just re-puts the mapping);
  * on Spark they are explicit jobs.
  */
object SchemaEvolution {

  /** Read a table whose partitions were written under DIFFERENT schema
    * generations (columns added over time): `mergeSchema` unions the
    * per-file footers into one wide schema, null-filling columns a
    * generation predates — the add-a-column migration WITHOUT rewriting
    * 100 TB of history (the rewrite-everything alternative is a full
    * corpus pass per schema change).
    *
    * Cost note: merging reads every file footer up front (driver-side
    * listing + parallel footer fetch) — at very large file counts, prefer
    * a table format that centralizes the schema; within plain parquet this
    * is the idiomatic evolution path and scans/prunes exactly like a
    * single-schema read thereafter.
    */
  def readMerged(spark: SparkSession, paths: String*): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(paths: _*)
}

/** Small-file compaction: rewrite a parquet directory so each output file
  * lands near a target byte size. Streaming sinks, per-cell index appends,
  * and incremental upserts all accrete small files; at scale the file
  * COUNT (listing, footer reads, task scheduling — a task per file) starts
  * to dominate scan cost long before the bytes do.
  */
object Compaction {

  /** Total on-disk bytes of the data files under `dir` (local-fs walk —
    * the driver-side statistic that sizes the rewrite; on a cluster this
    * is one `FileSystem.getContentSummary` call).
    */
  def dataBytes(dir: String): Long = {
    val root = java.nio.file.Paths.get(dir)
    def walk(p: java.nio.file.Path): Long =
      if (java.nio.file.Files.isDirectory(p))
        graft.util.FsUtil.listDir(p)(_.map(walk).sum)
      else if (p.getFileName.toString.endsWith(".parquet"))
        java.nio.file.Files.size(p)
      else 0L
    walk(root)
  }

  /** Rewrite `inDir` into `outDir` targeting ceil(bytes/targetBytes)
    * output files: one round-robin shuffle sized from the measured input,
    * then a plain parquet write. Row-identical to the input (oracle-gated);
    * the only change is physical layout. `repartition(n)` (not `coalesce`):
    * coalesce merges whole input partitions without a shuffle, so one
    * oversized input file would pass through un-split and files stay
    * skewed — the point of compaction is uniform target-sized output.
    *
    * Returns the number of files actually written — this can be BELOW the
    * byte-derived target when the input has fewer rows than target files
    * (empty shuffle partitions write no file) or when footer overhead of a
    * badly shattered input inflates its byte count.
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val nFiles = math.max(1L, (dataBytes(inDir) + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inDir).repartition(nFiles)
      .write.mode("overwrite").parquet(outDir)
    def countFiles(p: java.nio.file.Path): Int =
      if (java.nio.file.Files.isDirectory(p))
        graft.util.FsUtil.listDir(p)(_.map(countFiles).sum)
      else if (p.getFileName.toString.endsWith(".parquet")) 1 else 0
    countFiles(java.nio.file.Paths.get(outDir))
  }
}
