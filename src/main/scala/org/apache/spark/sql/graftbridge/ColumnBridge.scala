package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public Column(Expression) constructor; the
  * supported bridge (`classic.ExpressionUtils`) is `private[sql]`. This
  * shim lives inside the `org.apache.spark.sql` package tree to expose it
  * to graft's custom Catalyst expressions — the usual pattern for
  * extension libraries building native expressions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** `AbstractDataType` is `private[sql]`; expressions outside the spark
  * package tree need this alias to declare `inputTypes` (the standard
  * extension-library workaround, same as [[ColumnBridge]]).
  */
object TypeBridge {
  type AbstractType = org.apache.spark.sql.types.AbstractDataType
}
