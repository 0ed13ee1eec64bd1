package graft.store

import java.nio.file.{Files, Path}

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.util.HadoopOutputFile
import org.apache.spark.sql.{GraftBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.StructType

/** DRIVER-SIDE parquet segment writer for metadata-scale store mutations
  * (r18, guide §5 "the driver should do almost no data work" read in
  * reverse: a point mutation should cost no DISTRIBUTED work).
  *
  * Every single-entry store op (`upsert`, `partialUpdate`, `delete`,
  * `upsertIf`) and small-Seq `upsertAll` stages a delta whose rows are
  * ALREADY DRIVER-RESIDENT — yet the former path bounced them through
  * `Seq(...).toDS().write.parquet`: a full Dataset plan (analysis +
  * optimization), a scheduled one-task job, and the Hadoop commit
  * protocol, per mutation — ~100 ms of fixed engine overhead to move a
  * few hundred bytes that never needed an executor. JobProfile showed
  * this per-action overhead as the s-family's dominant cost (the r17
  * "driver gap").
  *
  * This writer produces the SAME bytes the distributed path would — it
  * runs Spark's own `ParquetWriteSupport` (the exact WriteSupport every
  * executor parquet task uses) under the session's parquet conf (legacy
  * format, output timestamp type, rebase modes, codec) — so readers
  * (which pass an explicit schema) cannot tell the difference. Only HOW
  * the staged file is produced changes; the staging directory + atomic
  * publish + pointer-swap commit protocol around it is untouched.
  *
  * Scale contract: callers hand a `Seq` that is by definition driver-
  * resident and metadata-scale (the distributed batch surfaces —
  * `bulkLoad`, `upsertAll(Dataset)`, `merge` — keep their executor-side
  * writes; they may be corpus-scale).
  */
object DirectParquet {

  /** Write `rows` (external Rows matching `schema`) as one parquet file
    * under directory `dir` (created if absent).
    */
  def writeRows(spark: SparkSession, dir: Path, schema: StructType,
                rows: Seq[Row]): Unit = {
    Files.createDirectories(dir)
    val hconf = GraftBridge.hadoopConf(spark)
    val sql = GraftBridge.sqlConf(spark)
    ParquetWriteSupport.setSchema(schema, hconf)
    // the keys ParquetWriteSupport.init asserts/reads — populated from the
    // session conf exactly as ParquetFileFormat.prepareWrite does
    hconf.set(SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key,
      sql.writeLegacyParquetFormat.toString)
    hconf.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key,
      sql.parquetOutputTimestampType.toString)
    hconf.set(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key,
      sql.parquetFieldIdWriteEnabled.toString)
    hconf.set(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key,
      sql.getConf(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE).toString)
    hconf.set(SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key,
      sql.getConf(SQLConf.PARQUET_REBASE_MODE_IN_WRITE).toString)
    hconf.set(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key,
      sql.getConf(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE).toString)
    val codec = sql.parquetCompressionCodec.toLowerCase match {
      case "uncompressed" | "none" => CompressionCodecName.UNCOMPRESSED
      case other => CompressionCodecName.valueOf(other.toUpperCase)
    }
    val file = dir.resolve(
      s"part-00000-${java.util.UUID.randomUUID}${codec.getExtension}.parquet")
    val conv = CatalystTypeConverters.createToCatalystConverter(schema)
    val writer = new RowBuilder(
      HadoopOutputFile.fromPath(
        new org.apache.hadoop.fs.Path(file.toUri), hconf))
      .withConf(hconf)
      .withCompressionCodec(codec)
      .build()
    try rows.foreach(r => writer.write(conv(r).asInstanceOf[InternalRow]))
    finally writer.close()
  }

  private class RowBuilder(out: org.apache.parquet.io.OutputFile)
    extends ParquetWriter.Builder[InternalRow, RowBuilder](out) {
    override def self(): RowBuilder = this
    override def getWriteSupport(conf: Configuration): WriteSupport[InternalRow] =
      new ParquetWriteSupport
  }
}
