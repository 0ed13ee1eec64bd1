package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSONL (one JSON object per line) corpus source/sink — the interchange
  * format of LLM training-data pipelines (and the reference's export
  * tooling writes JSON dumps, tools/elastic_migrate_tool.py:44-63).
  *
  * Backed by Spark's `json` datasource: the write is one file per
  * partition of newline-delimited objects (distributed, no driver
  * funnel); the read REQUIRES an explicit schema — schema inference is a
  * full extra pass over the corpus, which at 100 TB doubles the scan
  * before any work starts, and silently widens types on dirty data.
  * `columnNameOfCorruptRecord` rows surface under `_corrupt_record` when
  * the schema includes it (PERMISSIVE default), so a dirty corpus can be
  * partitioned into clean/quarantine without failing the job.
  */
object Jsonl {

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Streaming JSONL source — the realistic shape of a live event feed
    * (appenders drop line-delimited JSON files into a directory; the
    * FileStreamSource picks up new files per micro-batch). Explicit schema
    * for the same reason as [[read]].
    */
  def readStream(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).json(path)

  /** Dirty-corpus read: PERMISSIVE mode with the corrupt-record column
    * surfaced, so malformed lines land as rows with `corruptCol` set and
    * every data column null — the corpus splits into clean/quarantine
    * WITHOUT failing the job (at 100 TB there is always a bad shard).
    *
    * Caller note: Spark refuses queries that reference ONLY the internal
    * corrupt-record column of a JSON scan (the parser would need a second
    * pass). Reference any data column alongside it — e.g. a no-op
    * `where(col("doc_id").isNotNull || col(corruptCol).isNotNull)`, as the
    * x7 entry does; a `cache()` also works but pins the corpus in storage
    * memory.
    */
  def readWithQuarantine(spark: SparkSession, path: String, schema: StructType,
                         corruptCol: String = "_corrupt_record"): DataFrame =
    spark.read
      .option("columnNameOfCorruptRecord", corruptCol)
      .schema(schema.add(corruptCol, org.apache.spark.sql.types.StringType))
      .json(path)
}

/** CSV corpus source/sink, same discipline as [[Jsonl]]: explicit schema on
  * the read (no inference pass), header on the write, Spark's default
  * quote/escape rules — which round-trip arbitrary text containing commas,
  * quotes, and newlines (`multiLine` on the read side handles quoted
  * embedded newlines).
  */
object Csv {

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true").option("multiLine", "true").csv(path)
}

/** ORC corpus source/sink — the second columnar interchange format a
  * catalog meets in the wild (Hive-era warehouses emit it). Same read/
  * write discipline as parquet: self-describing footers, so the explicit
  * schema is a projection contract (columns pruned at the stripe level,
  * predicates pushed to stripe/row-group statistics) rather than an
  * inference crutch. At 100 TB an ORC scan prunes exactly like the
  * parquet path — `PushedFilters` land in the ORC reader the same way.
  */
object Orc {

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)
}
