package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Spark internals the public API doesn't expose:
  * Column ⇄ Expression conversion for wiring custom Catalyst expressions
  * (graft.functions.*) into ordinary Column pipelines. Lives in the
  * org.apache.spark.sql package solely for access; no Spark code is modified.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** The session's Hadoop configuration with every `spark.sql.*`/
    * `spark.hadoop.*` override applied — what a write task would see
    * (`sessionState` is `private[sql]`).
    */
  def hadoopConf(spark: SparkSession): org.apache.hadoop.conf.Configuration =
    spark.asInstanceOf[classic.SparkSession].sessionState.newHadoopConf()

  /** The session's SQLConf (for parquet writer settings — legacy format,
    * timestamp type, codec — so a driver-side parquet write is
    * byte-compatible with the distributed write path).
    */
  def sqlConf(spark: SparkSession): org.apache.spark.sql.internal.SQLConf =
    spark.asInstanceOf[classic.SparkSession].sessionState.conf
}
