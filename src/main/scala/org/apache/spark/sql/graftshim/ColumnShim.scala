package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnConversions, ExpressionColumnNode}

/** Bridge between Catalyst `Expression`s and the public `Column` API.
  *
  * Spark 4 made the Column↔Expression constructors `private[sql]`
  * (Column now wraps a `ColumnNode`); extension libraries providing
  * native expressions need this two-way shim, placed under
  * `org.apache.spark.sql` for access — the standard pattern used by
  * public Spark extension projects.
  */
object ColumnShim {

  def column(e: Expression): Column = Column(ExpressionColumnNode(e))

  def expression(c: Column): Expression = ColumnConversions.expression(c)
}
