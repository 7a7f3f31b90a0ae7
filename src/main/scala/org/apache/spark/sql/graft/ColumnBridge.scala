package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between [[Column]] and Catalyst [[Expression]] for graft's
  * custom expressions. Spark 4 routes Column through API-agnostic
  * ColumnNodes; the classic converters ([[ExpressionUtils]]) are
  * `private[sql]`, so this one-file shim lives in an `org.apache.spark
  * .sql` subpackage — the standard extension-library technique — and is
  * the ONLY thing in the repo that does.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGER Column -> Expression conversion (the lazy `expression` wraps
    * the ColumnNode, which only the Dataset API unwraps during plan
    * building — a SQL function builder needs the converted catalyst tree
    * NOW, with builtin calls as analyzer-resolvable UnresolvedFunctions).
    */
  def resolvedExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
