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
      (args: Seq[Expression]) => { arity(args, 1, "graft_tokenize(str)"); StandardTokensExpr(args.head) }),
    ("graft_uri_tokenize",
      new ExpressionInfo(classOf[UriTokensExpr].getName, "graft_uri_tokenize"),
      (args: Seq[Expression]) => { arity(args, 1, "graft_uri_tokenize(str)"); UriTokensExpr(args.head) }),
    ("graft_dot",
      new ExpressionInfo(classOf[DotProductExpr].getName, "graft_dot"),
      (args: Seq[Expression]) => { arity(args, 2, "graft_dot(a, b)"); DotProductExpr(args(0), args(1)) }),
    ("graft_norm",
      new ExpressionInfo(classOf[VecNormExpr].getName, "graft_norm"),
      (args: Seq[Expression]) => { arity(args, 1, "graft_norm(a)"); VecNormExpr(args.head) }),
    ("graft_simhash",
      new ExpressionInfo(classOf[SimHash64Expr].getName, "graft_simhash"),
      (args: Seq[Expression]) => { arity(args, 1, "graft_simhash(hashes)"); SimHash64Expr(args.head) }),
    ("graft_minhash",
      new ExpressionInfo(classOf[MinHashSigExpr].getName, "graft_minhash"),
      (args: Seq[Expression]) => { arity(args, 2, "graft_minhash(shingles, k)")
        MinHashSigExpr(args(0), intLit(args(1), "graft_minhash(shingles, k)")) }),
    ("graft_jaccard",
      new ExpressionInfo(classOf[JaccardSimExpr].getName, "graft_jaccard"),
      (args: Seq[Expression]) => { arity(args, 2, "graft_jaccard(a, b)"); JaccardSimExpr(args(0), args(1)) }),
    ("graft_srp_sig",
      new ExpressionInfo(classOf[SrpSigExpr].getName, "graft_srp_sig"),
      (args: Seq[Expression]) => { arity(args, 2, "graft_srp_sig(emb, bits)")
        SrpSigExpr(args(0), intLit(args(1), "graft_srp_sig(emb, bits)")) })
  )

  /** Wrong arity surfaces as a clear message during resolution, not an
    * IndexOutOfBoundsException from the builder.
    */
  private def arity(args: Seq[Expression], n: Int, sig: String): Unit =
    if (args.size != n)
      throw new IllegalArgumentException(s"$sig takes $n arguments, got ${args.size}")

  /** SQL-side int parameters (k, bits) must be literals — they size the
    * signature, which is part of the expression's static type/shape.
    */
  private def intLit(e: Expression, sig: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case _ => throw new IllegalArgumentException(s"$sig needs an INT literal parameter")
  }

  /** Register on a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    entries.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info, builder)
    }
}
