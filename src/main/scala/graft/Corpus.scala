package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic metadata corpus derived from the driver's `part` table, so
  * the engine's catalog operators (SURVEY.md §2) can be oracle-checked: the
  * exact same derivation is expressed once as a Spark plan (`metadata`) and
  * once as a DuckDB CTE (`metaSql`), and every `SparkEntry.oracleSql` entry
  * prefixes the CTE.
  *
  * The value domains mirror the reference's example corpus
  * (reference: tools/local_index_setup.py:81-120 — 8 categories, small org
  * set, csv-ish formats, hdfs target URIs); the derivation itself is pure
  * column arithmetic so both engines agree bit-for-bit.
  */
object Corpus {

  /** Spark side of the derivation. Columns match `metaSql` 1:1. */
  def metadata(spark: SparkSession, sfDir: String): DataFrame = {
    val part = spark.read.parquet(s"$sfDir/part.parquet")
    val key = col("p_partkey")
    val paddedId = lpad(key.cast("string"), 6, "0")
    part.select(
      paddedId.as("id"),
      concat(lit("cat"), (key % 8).cast("string")).as("category"),
      expr("timestamp'2015-01-01 00:00:00' + make_interval(0, 0, 0, cast(p_partkey % 365 as int))")
        .as("creationTime"),
      col("p_name").as("dataSample"),
      expr("CASE cast(p_partkey % 3 as int) WHEN 0 THEN 'csv' WHEN 1 THEN 'json' ELSE 'avro' END")
        .as("format"),
      (key % 2 === 0).as("isPublic"),
      concat(lit("org"), (key % 4).cast("string")).as("orgUUID"),
      col("p_size").cast("long").as("recordCount"),
      floor(col("p_retailprice")).cast("long").as("size"),
      concat(lit("http://data.example.com/"), regexp_replace(lower(col("p_type")), " ", "-"))
        .as("sourceUri"),
      concat(lit("hdfs://nameservice1/org"), (key % 4).cast("string"), lit("/"), paddedId)
        .as("targetUri"),
      col("p_name").as("title"),
      lit(null).cast("string").as("storeType")
    )
  }

  /** DuckDB side of the derivation — prefix of every oracle SQL statement. */
  val metaSql: String =
    """WITH meta AS (
      |  SELECT
      |    lpad(cast(p_partkey AS VARCHAR), 6, '0') AS id,
      |    'cat' || cast(p_partkey % 8 AS VARCHAR) AS category,
      |    TIMESTAMP '2015-01-01 00:00:00' + INTERVAL (p_partkey % 365) DAY AS creationTime,
      |    p_name AS dataSample,
      |    CASE p_partkey % 3 WHEN 0 THEN 'csv' WHEN 1 THEN 'json' ELSE 'avro' END AS format,
      |    p_partkey % 2 = 0 AS isPublic,
      |    'org' || cast(p_partkey % 4 AS VARCHAR) AS orgUUID,
      |    cast(p_size AS BIGINT) AS recordCount,
      |    cast(floor(p_retailprice) AS BIGINT) AS "size",
      |    'http://data.example.com/' || replace(lower(p_type), ' ', '-') AS sourceUri,
      |    'hdfs://nameservice1/org' || cast(p_partkey % 4 AS VARCHAR) || '/' || lpad(cast(p_partkey AS VARCHAR), 6, '0') AS targetUri,
      |    p_name AS title
      |  FROM part
      |)
      |""".stripMargin
}
