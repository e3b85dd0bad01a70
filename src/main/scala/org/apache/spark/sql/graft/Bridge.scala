package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Accessor for the `private[sql]` Column ⇄ Expression converters — the
  * standard extension-point bridge for libraries that register custom
  * Catalyst expressions (Spark 4 moved these behind `classic`). */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly convert a Column's node tree to a Catalyst expression tree
    * (builtins become `UnresolvedFunction`s the analyzer then resolves).
    * [[expression]] instead wraps the node in a lazy `ColumnNodeExpression`
    * leaf, which only Dataset analysis converts — inside a
    * `FunctionRegistry` builder that leaf would survive to codegen as
    * `Unevaluable`; use THIS from registry builders. */
  def resolvedExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
