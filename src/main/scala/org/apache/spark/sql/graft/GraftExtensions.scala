package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL exposure of graft's custom expressions.
  *
  * Two entry points for the two deployment shapes:
  *   - cluster config: `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`
  *     (applied at session instantiation — the standard extension hook);
  *   - an existing session: `GraftExtensions.register(spark)` adds the
  *     functions to the session's registry directly (what the specs and
  *     notebooks use, since `getOrCreate` ignores extensions on an
  *     already-built session).
  *
  * After either, `SELECT fold_accents(text)` works in `spark.sql` and
  * the parser resolves the function to the codegen'd
  * [[FoldAccentsExpr]] — no UDF registration involved.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  private type Description =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private val functions: Seq[Description] = Seq(
    (new FunctionIdentifier("fold_accents"),
      new ExpressionInfo(classOf[FoldAccentsExpr].getName, "fold_accents"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "fold_accents expects exactly one argument")
        FoldAccentsExpr(args.head)
      }))

  /** Register into an already-built session's function registry. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(ident, info, builder)
    }
}
