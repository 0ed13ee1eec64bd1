package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Temporary probe: debug d12 at sf0.01.
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.01"
    val out = SparkEntry.queries("d12_span_removal")(spark, d)
    println("== docs with removals: " + out.where(col("removed_tokens") > 0).count())
    out.where(col("removed_tokens") > 0).orderBy("doc_id").show(10)
    // raw spans for the first few planted docs
    val docsDf = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" the quick brown fox jumps over the lazy dog again and again")))
          .otherwise(col("text")).as("text"))
    val spans = graft.operators.Dedup.repeatedSpans(docsDf, 8)
    spans.where(col("doc_id").isin(0L, 7L, 14L, 21L)).orderBy("doc_id", "start_tok").show(20)
    spark.stop()
  }
}
