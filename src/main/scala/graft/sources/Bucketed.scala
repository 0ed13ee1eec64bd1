package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed parquet tables — the storage-layout half of shuffle
  * elimination. A fact table written `bucketBy(N, key)` is pre-hash-
  * partitioned on disk: every subsequent equi-join or aggregation on that
  * key reads the buckets AS the shuffle output, so the exchange disappears
  * from the plan entirely. At 100 TB this converts the dominant cost of a
  * repeated join (re-shuffling the big side every run) into a one-time
  * write-side layout decision — the same contract as Hive bucketing and
  * the store's directory-bucketed bases (store/MetadataStore.scala), but
  * expressed through Spark's session catalog so Catalyst plans against it.
  *
  * Rules the helpers enforce/document:
  *  - both join sides bucketed on the JOIN key with the SAME bucket count
  *    (mismatched counts re-shuffle the smaller-bucketed side);
  *  - `sortBy` within buckets so sort-merge join can also skip its sorts
  *    (Spark only trusts one file per bucket for ordering — coalesce
  *    before write if sort elimination matters);
  *  - bucket count sized so one bucket ≈ one task's comfortable input
  *    (128–512 MB post-compression at cluster scale).
  */
object Bucketed {

  /** Write `df` as a bucketed (and in-bucket sorted) parquet table
    * registered in the session catalog. `path` keeps the data out of the
    * default warehouse (the catalog entry still owns the bucketing spec —
    * a plain `spark.read.parquet(path)` would NOT see it).
    */
  def writeTable(df: DataFrame, table: String, key: String, buckets: Int,
                 path: String): Unit =
    df.write.mode("overwrite").format("parquet")
      .option("path", path)
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Equi-join two same-bucketed tables on `leftKey = rightKey`. With both
    * sides bucketed on their key at equal counts this plans exchange-free
    * (JoinsSpec pins the plan shape).
    */
  def join(spark: SparkSession, leftTable: String, rightTable: String,
           leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}

/** Date-partitioned parquet layout — the directory-pruning half of the
  * storage story (bucketing handles join keys; partitioning handles time).
  * An event log written `partitionBy(event_date)` turns every time-ranged
  * query into a directory listing: a one-day filter over a year of 100 TB
  * data opens 1/365th of the files before a single row is read
  * (PartitionFilters in the scan node — spec-pinned). Partition by a
  * LOW-cardinality derived column (day, not timestamp): each distinct
  * value is a directory, and 10⁶ tiny directories is its own pathology.
  */
object DatePartitioned {

  /** Write `df` partitioned by the calendar day of `tsCol` (UTC session). */
  def writeByDay(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("event_date", to_date(col(tsCol)))
      .write.mode("overwrite").partitionBy("event_date").parquet(path)

  /** Read back one day; the `event_date` equality is a partition filter —
    * it prunes directories at planning time, never touching other days'
    * files.
    */
  def readDay(spark: SparkSession, path: String, day: String): DataFrame =
    spark.read.parquet(path).where(col("event_date") === lit(day))

  /** Re-materialize SELECTED days of a date-partitioned table IN PLACE —
    * the backfill/correction primitive of an incremental lakehouse: late
    * data lands, an upstream bug is fixed, one day is recomputed — and
    * only that day's directory changes. The per-write
    * `partitionOverwriteMode=dynamic` option makes overwrite replace
    * exactly the partitions PRESENT in `fresh`; every other day's
    * directory is never read, listed, or rewritten (spec-pinned
    * byte-for-byte). At 100 TB × years of days this is the difference
    * between an O(day) nightly correction job and an O(table) rewrite.
    *
    * `event_date` is re-derived from the timestamp exactly as
    * [[writeByDay]] derives it, so callers hand over plain corrected rows
    * and cannot desync the partition key from the data.
    */
  def refreshDays(fresh: DataFrame, tsCol: String, path: String): Unit =
    fresh.withColumn("event_date", to_date(col(tsCol)))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("event_date").parquet(path)
}

/** Range-sorted parquet layout — the third pruning tier, below directory
  * partitioning: rows range-partitioned AND sorted on a scan predicate
  * column, so every file (and every row group inside it) covers a narrow
  * disjoint value range and carries tight min/max footer statistics. A
  * range filter then skips whole files/row groups at read time via the
  * pushed-down predicate — finer-grained than directories (no directory
  * explosion) and orthogonal to them (partition by day, range-sort by
  * timestamp WITHIN the day, and an hour-range query opens 1/24th of one
  * day's bytes). This is the parquet-native form of what table formats
  * call clustering/Z-ordering on one dimension.
  */
object SortedLayout {

  /** Write `df` range-partitioned and sorted on `sortCol` into `files`
    * files. `repartitionByRange` (NOT round-robin `repartition`): round
    * robin would spread every value range across every file, making the
    * min/max stats span everything and prune nothing.
    */
  def write(df: DataFrame, sortCol: String, path: String, files: Int): Unit =
    df.repartitionByRange(files, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(path)

  /** Range-read: both bounds reach the parquet scan as PushedFilters
    * (plan-pinned), where the footer min/max statistics skip non-
    * overlapping files and row groups.
    */
  def readRange(spark: SparkSession, path: String, sortCol: String,
                lo: Column, hi: Column): DataFrame =
    spark.read.parquet(path).where(col(sortCol) >= lo && col(sortCol) < hi)
}

/** Z-order (Morton-curve) clustered parquet layout — multi-dimension
  * footer-stat pruning, the tier [[SortedLayout]] cannot reach: a 1-D sort
  * gives tight min/max stats on the sort column ONLY, so a predicate on
  * any other column scans everything. Interleaving the bits of two
  * rank-bucketed dimensions into one Morton key and range-sorting on IT
  * makes every file/row group cover a small RECTANGLE of the 2-D space —
  * both columns carry usable min/max stats, and a predicate on either
  * dimension (or a 2-D box) skips the non-overlapping row groups. This is
  * the clustering technique lakehouse table formats expose as
  * `OPTIMIZE ... ZORDER BY`; here it is plain parquet + a derived sort
  * key, dropped before the write.
  *
  * Scale shape: one 4-scalar min/max aggregate (the broadcast-stats
  * pattern), a narrow per-row key computation (pure integer column
  * arithmetic, codegen'd), and the same single range shuffle a 1-D sort
  * costs — Z-ordering 100 TB is exactly as expensive as sorting it, but
  * serves range predicates on BOTH dimensions. Equal-width bucketing from
  * global min/max (not rank quantiles) keeps the key computation free of
  * a second pass; heavily skewed dimensions would want approx-quantile
  * boundaries instead — same interleave, different bucketer.
  */
object ZOrderLayout {

  private val Bits = 16 // 65536 buckets/dimension — finer than any file count

  /** Equal-width bucket of a long value into [0, 2^Bits) — exact integer
    * arithmetic, no float rounding to diverge across engines.
    */
  private def bucket(v: Column, lo: Long, hi: Long): Column =
    ((v - lit(lo)) * lit(1L << Bits)) / lit(math.max(1L, hi - lo + 1))

  /** Bit-interleave two Bits-wide bucket columns into the Morton key:
    * x occupies even bits, y odd — adjacent keys are adjacent in BOTH
    * dimensions, which is the whole trick.
    */
  private def interleave(x: Column, y: Column): Column =
    (0 until Bits).foldLeft(lit(0L)) { (acc, i) =>
      acc.bitwiseOR(shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** Long view of a column for bucketing. Timestamps bucket at second
    * granularity; TIMESTAMP_NTZ (how timezone-less µs parquet reads)
    * refuses a direct long cast, so it re-types through TIMESTAMP first —
    * the persisted column itself is never touched.
    */
  private def asLong(df: DataFrame, name: String): Column =
    df.schema(name).dataType match {
      case org.apache.spark.sql.types.TimestampNTZType =>
        col(name).cast("timestamp").cast("long")
      case _ => col(name).cast("long")
    }

  /** Write `df` Z-order-clustered on (`colA`, `colB`) into `files` files.
    * Both columns must cast to long (see [[asLong]]). The Morton key is
    * computed, range-sorted on, and dropped — the persisted schema is
    * unchanged.
    */
  def write(df: DataFrame, colA: String, colB: String, path: String,
            files: Int): Unit = {
    val (la, lb) = (asLong(df, colA), asLong(df, colB))
    val r = df.agg(min(la), max(la), min(lb), max(lb)).head
    val z = interleave(
      bucket(la, r.getLong(0), r.getLong(1)),
      bucket(lb, r.getLong(2), r.getLong(3)))
    df.withColumn("_zorder", z)
      .repartitionByRange(files, col("_zorder"))
      .sortWithinPartitions("_zorder")
      .drop("_zorder")
      .write.mode("overwrite").parquet(path)
  }

  /** 2-D box read: all four bounds reach the parquet scan as pushed
    * filters (plan-pinned), where the now-rectangular row-group stats
    * skip on both dimensions.
    */
  def readBox(spark: SparkSession, path: String,
              colA: String, aLo: Column, aHi: Column,
              colB: String, bLo: Column, bHi: Column): DataFrame =
    spark.read.parquet(path)
      .where(col(colA) >= aLo && col(colA) < aHi &&
        col(colB) >= bLo && col(colB) < bHi)
}

/** Bloom-filtered parquet layout — the point-lookup pruning tier for
  * high-cardinality keys that the other tiers cannot serve: directory
  * partitioning explodes at 10⁸ distinct keys, and range sorting
  * ([[SortedLayout]]) only helps the ONE column the data is sorted on. On
  * a key the layout is NOT ordered by, every file's min/max footer stats
  * span the whole key domain, so stats prune nothing — the spec
  * demonstrates exactly that, then shows the bloom filters rejecting the
  * non-matching row groups the stats could not.
  *
  * The writer embeds a split-block bloom filter per row group for the key
  * column (parquet-native, `parquet.bloom.filter.enabled#col`); a pushed
  * equality/IN predicate is tested against the filter at scan planning and
  * non-matching row groups are never read. At 100 TB: a point lookup on a
  * secondary key reads ~(false-positive rate) of the corpus instead of all
  * of it, for ~1 byte/row of filter space — no second copy of the data,
  * no external index, and the same file set keeps serving every other
  * query shape. Size `expectedNdv` to the real per-row-group key count:
  * undersizing inflates the false-positive rate, oversizing wastes the
  * filter bytes that have to be read per candidate row group.
  */
object BloomLayout {

  /** Write `df` hash-distributed on `keyCol` into `files` files with a
    * bloom filter on that column in every row group. Hash distribution
    * (not range): a point key then lives in exactly one file, and the
    * layout keeps accepting appends without a global sort.
    */
  def write(df: DataFrame, keyCol: String, path: String, files: Int,
            expectedNdv: Long): Unit =
    df.repartition(files, col(keyCol))
      .write.mode("overwrite")
      .option(s"parquet.bloom.filter.enabled#$keyCol", "true")
      .option(s"parquet.bloom.filter.expected.ndv#$keyCol", expectedNdv.toString)
      .parquet(path)

  /** Point lookup: the equality (or IN) predicate reaches the parquet
    * reader as a pushed filter (plan-pinned), where the per-row-group
    * bloom filters skip everything but the key's own row group (plus
    * false positives).
    */
  def lookup(spark: SparkSession, path: String, keyCol: String,
             keys: Seq[Long]): DataFrame =
    spark.read.parquet(path).where(col(keyCol).isin(keys: _*))
}
