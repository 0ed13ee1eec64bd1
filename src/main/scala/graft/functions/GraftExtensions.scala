package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Catalyst integration point: registers the engine's native expressions so
  * SQL users call them like built-ins
  * (`spark.sql("SELECT graft_tokenize(text) …")`).
  *
  * Two routes:
  *  - `--conf spark.sql.extensions=graft.functions.GraftExtensions` at
  *    session build (the SparkSessionExtensions contract), or
  *  - `GraftFunctions.register(spark)` on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.entries.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftFunctions {

  private[functions] val entries: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_tokenize",
      new ExpressionInfo(classOf[StandardTokensExpr].getName, "graft_tokenize"),
      (args: Seq[Expression]) => StandardTokensExpr(args.head)),
    ("graft_uri_tokenize",
      new ExpressionInfo(classOf[UriTokensExpr].getName, "graft_uri_tokenize"),
      (args: Seq[Expression]) => UriTokensExpr(args.head))
  )

  /** Register on a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    entries.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info, builder)
    }
}
