package graft

import graft.operators.Multimodal
import graft.streaming.EventStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.sql.Timestamp

class StreamingMultimodalSpec extends AnyFunSuite with Matchers with SparkSupport {
  import spark.implicits._

  // ------------------------------------------------------------- streaming

  test("windowed counts with watermark: late events beyond the watermark are dropped") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val agg = EventStream.windowedCounts(mem.toDF.toDF("ts", "event_type", "value"))
    val q = agg.writeStream.format("memory").queryName("wmtest").outputMode("append").start()
    try {
      mem.addData(
        (Timestamp.valueOf("2020-01-01 10:00:00"), "click", 1.0),
        (Timestamp.valueOf("2020-01-01 10:30:00"), "click", 2.0))
      q.processAllAvailable()
      // advance the watermark past 11:00 so the 10:00 window closes
      mem.addData((Timestamp.valueOf("2020-01-01 12:30:00"), "click", 5.0))
      q.processAllAvailable()
      // a late event inside the closed window: must be dropped
      mem.addData((Timestamp.valueOf("2020-01-01 10:15:00"), "click", 99.0))
      q.processAllAvailable()
      val rows = spark.table("wmtest")
        .select($"window_start", $"cnt", $"sum_value".cast("double"))
        .as[(Timestamp, Long, Double)].collect().toSeq
      rows shouldBe Seq((Timestamp.valueOf("2020-01-01 10:00:00"), 2L, 3.0))
    } finally q.stop()
  }

  test("streaming backfill equals the batch aggregation (AvailableNow, complete mode)") {
    val path = "/root/testdata/sf0.001/events.parquet"
    val streamed = EventStream.backfillWindowedCounts(spark, path)
      .orderBy("window_start", "event_type")
      .select($"window_start", $"event_type", $"cnt", $"sum_value".cast("string"))
      .collect().toSeq
    val batch = EventStreamBatch.windowedCountsBatch(
      EventStream.withEventTime(spark.read.parquet(path)))
      .orderBy("window_start", "event_type")
      .select($"window_start", $"event_type", $"cnt", $"sum_value".cast("string"))
      .collect().toSeq
    streamed should not be empty
    streamed shouldBe batch
  }

  // ------------------------------------------------------------ multimodal

  private val docsDf = Seq(
    (0L, "hello world", "en", "src1", 11L),
    (1L, "spark streams", "en", "src1", 13L),
    (2L, "catalyst rules", "en", "src2", 14L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("media records carry binary payloads with typed metadata") {
    val media = Multimodal.mediaFromDocuments(docsDf).orderBy("media_id").collect()
    media.map(_.getAs[String]("kind")).toSeq shouldBe Seq("image", "audio", "video")
    media.foreach(_.getAs[Array[Byte]]("payload").length shouldBe 16) // md5 = 16 bytes
  }

  test("feature extraction: nibble histogram matches a reference implementation, batched per partition") {
    val media = Multimodal.mediaFromDocuments(docsDf)
    val feats = Multimodal.features(spark, media).collect().sortBy(_.media_id)
    feats.foreach { f =>
      f.dim shouldBe 16
      f.features.sum shouldBe 32.0 // 16 bytes → 32 nibbles
    }
    val md = java.security.MessageDigest.getInstance("MD5").digest("hello world".getBytes)
    feats.head.features shouldBe Multimodal.FeatureExtractor.stub(md)
  }

  test("frame sampling stub: stride subsamples the payload deterministically") {
    val media = Multimodal.mediaFromDocuments(docsDf)
    val sampled = Multimodal.sampleFrames(spark, media, 4).orderBy("media_id").collect()
    sampled.foreach(_.getInt(1) shouldBe 4) // 16 bytes, stride 4
  }
}

/** Batch twin of the streaming aggregation, used to prove stream/batch
  * equivalence.
  */
object EventStreamBatch {
  import org.apache.spark.sql.DataFrame
  def windowedCountsBatch(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,6)")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("cnt"), col("sum_value"))
}
