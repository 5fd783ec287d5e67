package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `Column(expr)` / `col.expr` bridge; the
  * supported internal hatch (`org.apache.spark.sql.classic.ExpressionUtils`)
  * is `private[sql]`, so this one-file shim lives under the
  * `org.apache.spark.sql` package tree to re-export it for graft's custom
  * Catalyst expressions. No Spark internals are modified. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
