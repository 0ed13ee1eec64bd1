package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured-Streaming ingest over the driver's `events` table
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference is strictly request/response (its NATS traffic is
  * fire-and-forget output, SURVEY.md §2.8); this is the CDC/metrics ingest
  * path a catalog at scale grows: a file (or Kafka) source, event-time
  * tumbling windows with a watermark bounding state, and idempotent sink
  * semantics via Trigger.AvailableNow for deterministic backfills.
  *
  * At scale the stateful aggregation shuffles on (window, event_type) only;
  * the watermark caps state size — without it, per-window state lives
  * forever (the classic unbounded-state failure).
  */
object EventStream {

  val EventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)
  ))

  /** Normalize the event-time column: long nanosecond epochs (how the
    * driver's parquet reads under nanosAsLong) become microsecond
    * timestamps; real timestamps pass through.
    */
  def withEventTime(events: DataFrame): DataFrame =
    if (events.schema("ts").dataType == LongType)
      events.withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
    else events

  /** Windowed per-type aggregation of a raw event stream: 1-hour tumbling
    * event-time windows, 1-hour watermark. `sum_value` is summed in
    * DECIMAL(18,6) so the result is exact and associative — double summation
    * order across partitions would otherwise make results run-dependent.
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,6)")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("cnt"), col("sum_value"))

  /** Deterministic batch backfill through the *streaming* engine: read the
    * parquet events as a file stream, run the windowed aggregation to a
    * memory sink with Trigger.AvailableNow, and return the final table.
    * Complete output mode emits every window (nothing is lost to the final
    * watermark, which is what an append-mode backfill would clip).
    */
  def backfillWindowedCounts(spark: SparkSession, path: String): DataFrame = {
    val name = "graft_events_" + java.util.UUID.randomUUID().toString.replace("-", "")
    // FileStreamSource wants a directory; stage a single-file input behind a
    // temp-dir symlink so callers can point at one parquet file.
    val p = java.nio.file.Paths.get(path)
    val dir =
      if (java.nio.file.Files.isRegularFile(p)) {
        val d = java.nio.file.Files.createTempDirectory("graft-stream")
        java.nio.file.Files.createSymbolicLink(d.resolve(p.getFileName), p)
        d.toString
      } else path
    // Infer the schema from a batch read of the same files: the driver's
    // parquet encodes ts as nanosecond INT64 (read as long nanos under
    // spark.sql.legacy.parquet.nanosAsLong), which a hand-declared
    // TimestampType would mis-read.
    val stream = spark.readStream.schema(spark.read.parquet(dir).schema).parquet(dir)
    val q = windowedCounts(withEventTime(stream))
      .writeStream.format("memory").queryName(name)
      .outputMode("complete").trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
