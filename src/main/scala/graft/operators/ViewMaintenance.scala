package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance of a materialized JOIN view — the second half
  * of the lakehouse view-maintenance story beside the store's incremental
  * AGGREGATE maintenance (`MetadataStore.maintainCategoryStats`, the s12
  * entry): keep `V = A ⋈ B` current under changes to either side at cost
  * proportional to the CHANGES (× their join fan-out), never a full
  * recompute.
  *
  * Change model (the s10/s12 discipline): the caller knows the NET
  * changed identities per side for the window — `changedAIds` (A rows
  * inserted, deleted, or updated, by A's unique id) and `changedBKeys`
  * (B rows changed, by B's join key, which is B's identity in the view).
  *
  * Fold rule — affected-slice replacement, exact under inserts, deletes,
  * AND updates (including an update that MOVES a row's join key):
  *
  *  - `keep`: view rows touching NO changed identity pass through.
  *  - `addA`: changed A rows (as they exist NOW — deleted ids simply no
  *    longer exist) re-join the full current B.
  *  - `addB`: UNCHANGED A rows re-join only the changed B slice (the
  *    changed-A × changed-B overlap is already covered by `addA`, so no
  *    pair is emitted twice and no dedup stage exists).
  *
  * The changed-id windows are DATAFRAMES (usually a projection of the
  * store's change feed, `changesBetween(v).select("id")`), consumed
  * through broadcast semi/anti joins — the form that survives a change
  * window that GROWS with the corpus: a 10⁶-id window stays a distributed
  * table feeding dynamic/runtime pruning of the big-side scans, where a
  * collected literal IN-list of that size stops pushing to parquet scans
  * and bloats the plan. The `Seq[Any]` overload is sugar for feed-window-
  * bounded driver-side id lists (the s15 shape) and delegates to the
  * DataFrame path.
  *
  * At 100 TB: the changed sets are CDC-batch scale, so each semi/anti
  * probe is a broadcast (map-side filter, no shuffle of the big side),
  * and on a partitioned layout the broadcast side supplies dynamic
  * partition pruning exactly where a small literal list would have
  * supplied row-group pruning. `addA` reads |ΔA| rows plus B's matching
  * slice; `addB`'s probe of the big A side broadcasts the changed-B
  * slice. The one cost that scales with the VIEW is `keep`'s rewrite of
  * the view itself; [[refreshJoinViewPartitions]] removes it — partition
  * the materialized view on a bucket of the join key and dynamic
  * partition overwrite rewrites only touched buckets (the x15 day-refresh
  * shape applied to a view), leaving cold partitions' files byte-identical.
  */
object ViewMaintenance {

  private def requireDisjoint(aIdCol: String, aKeyCol: String, bKeyCol: String): Unit =
    require(bKeyCol != aIdCol && bKeyCol != aKeyCol,
      s"bKeyCol '$bKeyCol' collides with an A-side column " +
        s"(a=[$aIdCol,$aKeyCol]): the fold joins A against B unaliased, so " +
        "a shared name is ambiguous at analysis — rename one side before " +
        "maintaining")

  /** DataFrame-shaped change windows — the primary, scale-safe form.
    * `changedAIds` must expose column `aIdCol`; `changedBKeys` column
    * `bKeyCol`. Both are broadcast (CDC-batch scale by contract).
    */
  def maintainJoinView(viewOld: DataFrame, aNew: DataFrame, bNew: DataFrame,
                       aIdCol: String, aKeyCol: String, bKeyCol: String,
                       changedAIds: DataFrame, changedBKeys: DataFrame): DataFrame = {
    requireDisjoint(aIdCol, aKeyCol, bKeyCol)
    val dA = broadcast(changedAIds.select(col(aIdCol).as("__chg_a")).distinct())
    val dB = broadcast(changedBKeys.select(col(bKeyCol).as("__chg_b")).distinct())
    val keep = viewOld
      .join(dA, col(aIdCol) === col("__chg_a"), "left_anti")
      .join(dB, col(bKeyCol) === col("__chg_b"), "left_anti")
    val addA = aNew.join(dA, col(aIdCol) === col("__chg_a"), "left_semi")
      .join(bNew, col(aKeyCol) === col(bKeyCol))
    val addB = aNew.join(dA, col(aIdCol) === col("__chg_a"), "left_anti")
      .join(bNew.join(dB, col(bKeyCol) === col("__chg_b"), "left_semi"),
        col(aKeyCol) === col(bKeyCol))
    keep.unionByName(addA).unionByName(addB)
  }

  /** Driver-side id-list sugar for feed-window-bounded changes. Delegates
    * to the DataFrame form (same plan shape; the lists become one-column
    * broadcast locals). Lists must stay CDC-batch scale — a window that
    * grows with the corpus belongs in the DataFrame overload.
    */
  def maintainJoinView(viewOld: DataFrame, aNew: DataFrame, bNew: DataFrame,
                       aIdCol: String, aKeyCol: String, bKeyCol: String,
                       changedAIds: Seq[Any], changedBKeys: Seq[Any]): DataFrame = {
    requireDisjoint(aIdCol, aKeyCol, bKeyCol)
    val spark = viewOld.sparkSession
    def asDf(vs: Seq[Any], name: String, like: DataFrame): DataFrame = {
      import org.apache.spark.sql.types._
      val t = like.schema(name).dataType
      // coerce driver-side to the target column's external type — the old
      // isin(...) form cast implicitly (Seq[Int] against a bigint column
      // worked), and Row construction against an exact Catalyst type does
      // not, so the sugar must close that gap itself
      def coerce(v: Any): Any = (v, t) match {
        case (null, _) => null
        case (n: Number, LongType) => n.longValue()
        case (n: Number, IntegerType) => n.intValue()
        case (n: Number, ShortType) => n.shortValue()
        case (n: Number, ByteType) => n.byteValue()
        case (n: Number, DoubleType) => n.doubleValue()
        case (n: Number, FloatType) => n.floatValue()
        case (other, StringType) => other.toString
        case (other, _) => other
      }
      val rows = vs.map(v => org.apache.spark.sql.Row(coerce(v)))
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        StructType(Seq(StructField(name, t))))
    }
    maintainJoinView(viewOld, aNew, bNew, aIdCol, aKeyCol, bKeyCol,
      asDf(changedAIds, aIdCol, aNew), asDf(changedBKeys, bKeyCol, bNew))
  }

  /** The partition bucket a view row lives in: a stable hash of the join
    * key into `nBuckets` directories. Bucketing (not raw key values)
    * keeps the directory count bounded — a consumer-scale join key has
    * 10⁸ distinct values, and one directory per value is its own
    * pathology (the DatePartitioned low-cardinality rule). INT-typed to
    * match what partition-column type inference reads back from the
    * `bucket=N` directory names — a long here would force a cast on the
    * partition column at refresh time and defeat partition pruning.
    */
  def viewBucket(key: org.apache.spark.sql.Column, nBuckets: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(key), lit(nBuckets.toLong)).cast("int")

  /** Advance a MATERIALIZED join view IN PLACE — the write path of the
    * maintenance story: the view lives on disk partitioned by
    * `bucket = viewBucket(joinKey, nBuckets)`, and one maintenance cycle
    * rewrites ONLY the buckets a change touches (dynamic partition
    * overwrite — the x15 day-refresh machinery pointed at a view).
    * Untouched buckets — at 100 TB, the cold majority — are never
    * rewritten, and their files stay byte-identical (spec-pinned).
    *
    * Touched buckets are exactly the buckets holding any RETRACTED or
    * ADDED row: the buckets of changed A rows' OLD keys (an ids-only
    * semi-probe of the old view — this is what catches a key MOVE's
    * source bucket), of changed A rows' NEW keys, and of changed B keys.
    * The fresh content is the [[maintainJoinView]] fold restricted to
    * those buckets, with the keep-slice read through the view's STORED
    * partition column: the broadcast semi join on `bucket` is over the
    * partition key, so dynamic partition pruning confines the keep scan
    * to the touched directories — cost ∝ changes + the touched slice
    * (plus one ids-only column-pruned probe of the view for old homes),
    * never the view's payload. The add-slices need no bucket filter:
    * their rows' buckets are in the touched set by construction.
    *
    * A touched bucket whose fresh slice is EMPTY (its last rows were
    * deleted) is removed explicitly — dynamic overwrite only replaces
    * partitions PRESENT in the written data, so an emptied directory
    * would otherwise silently survive with its stale rows.
    *
    * Single-writer maintenance op (the ivfCompactSmallFiles discipline):
    * run from the view's refresh schedule, not concurrently with readers
    * mid-listing. A crash before the final write leaves the old view
    * intact (the fold is read-only); dynamic overwrite commits per
    * partition directory; a crash between the write and the empty-bucket
    * sweep leaves stale emptied dirs that RE-RUNNING the same refresh
    * heals (their rows still match the change window, so they retract
    * and sweep again).
    */
  def refreshJoinViewPartitions(spark: SparkSession, viewPath: String,
                                aNew: DataFrame, bNew: DataFrame,
                                aIdCol: String, aKeyCol: String, bKeyCol: String,
                                changedAIds: DataFrame, changedBKeys: DataFrame,
                                nBuckets: Int): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
    requireDisjoint(aIdCol, aKeyCol, bKeyCol)
    val dA = broadcast(changedAIds.select(col(aIdCol).as("__chg_a")).distinct())
    val dB = broadcast(changedBKeys.select(col(bKeyCol).as("__chg_b")).distinct())
    val viewOld = spark.read.parquet(viewPath)
    // Touched buckets: old homes of changed A rows ∪ new homes ∪ changed
    // B keys' buckets — a metadata-scale distinct (CDC-batch × 3),
    // COLLECTED before the overwrite: its old-homes branch probes the
    // view being replaced, so evaluating it lazily after the write would
    // read deleted files (and the wrong, post-refresh state).
    val touched: Seq[Int] = viewOld
      .join(dA, col(aIdCol) === col("__chg_a"), "left_semi")
      .select(col("bucket"))
      .unionByName(aNew
        .join(dA, col(aIdCol) === col("__chg_a"), "left_semi")
        .select(viewBucket(col(aKeyCol), nBuckets).as("bucket")))
      .unionByName(dB.select(viewBucket(col("__chg_b"), nBuckets).as("bucket")))
      .distinct().collect().map(_.getInt(0)).toSeq
    if (touched.isEmpty) return // empty change window: nothing to rewrite
    import spark.implicits._
    val touchedB = broadcast(touched.toDF("bucket"))
    val keep = viewOld
      .join(touchedB, Seq("bucket"), "left_semi") // partition-pruned scan
      .join(dA, col(aIdCol) === col("__chg_a"), "left_anti")
      .join(dB, col(bKeyCol) === col("__chg_b"), "left_anti")
    val addA = aNew.join(dA, col(aIdCol) === col("__chg_a"), "left_semi")
      .join(bNew, col(aKeyCol) === col(bKeyCol))
      .withColumn("bucket", viewBucket(col(aKeyCol), nBuckets))
    val addB = aNew.join(dA, col(aIdCol) === col("__chg_a"), "left_anti")
      .join(bNew.join(dB, col(bKeyCol) === col("__chg_b"), "left_semi"),
        col(aKeyCol) === col(bKeyCol))
      .withColumn("bucket", viewBucket(col(aKeyCol), nBuckets))
    val fresh = keep.unionByName(addA.select(keep.columns.map(col): _*))
      .unionByName(addB.select(keep.columns.map(col): _*))
    // Emptied-bucket detection is by FILE LISTING, not by reading data
    // back: dynamic overwrite only replaces partitions PRESENT in the
    // written rows, so a touched bucket whose fresh slice is empty keeps
    // its old files — indistinguishable from a rewritten one by content
    // queries alone. File names carry the write's job UUID, so a bucket
    // whose listing is UNCHANGED after the write was not rewritten: for a
    // touched bucket that means its slice emptied, and the stale
    // directory is deleted. Metadata-scale (|touched| listings, twice).
    def listing(bk: Int): Seq[String] = {
      val p = java.nio.file.Paths.get(viewPath, s"bucket=$bk")
      if (!java.nio.file.Files.isDirectory(p)) Seq.empty
      else graft.util.FsUtil.listDir(p)(_.map(_.getFileName.toString)
        .filter(_.endsWith(".parquet")).toSeq.sorted)
    }
    val before = touched.map(bk => bk -> listing(bk)).toMap
    fresh
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket").parquet(viewPath)
    val swept = touched.filter(bk => before(bk).nonEmpty && listing(bk) == before(bk))
    swept.foreach { bk =>
      graft.util.FsUtil.deleteRecursively(
        java.nio.file.Paths.get(viewPath, s"bucket=$bk"))
    }
    // the session's file-status cache still lists the replaced (and
    // swept) files of touched directories — drop it for subsequent reads
    spark.catalog.refreshByPath(viewPath)
  }

  /** Initial materialization of the bucketed view layout
    * ([[refreshJoinViewPartitions]]' write format).
    */
  def writeJoinView(view: DataFrame, aKeyCol: String, nBuckets: Int,
                    viewPath: String): Unit =
    view.withColumn("bucket", viewBucket(col(aKeyCol), nBuckets))
      .write.mode("overwrite").partitionBy("bucket").parquet(viewPath)
}
