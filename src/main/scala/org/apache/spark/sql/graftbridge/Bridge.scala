package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column↔Expression conversion (Spark 4
  * moved `Column` to a backend-agnostic ColumnNode representation; the
  * classic converters live behind `private[sql]`). This is the only
  * place the engine reaches past the public API, and only to wrap its
  * own Catalyst expressions as `Column`s.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a one-row-one-column DataFrame as a scalar-subquery
    * expression (what `might_contain` requires its bloom-filter side to
    * be: a constant or scalar subquery, never a join column). The
    * subquery executes once and its result is inlined as a constant for
    * the main scan — the same mechanism Spark's InjectRuntimeFilter
    * uses.
    */
  def scalarSubquery(df: org.apache.spark.sql.DataFrame): Column =
    column(org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
      df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution.analyzed))

  /** Register a temp SQL function on a live session (the
    * extensions-free path; `GraftExtensions` covers the
    * `spark.sql.extensions` config path).
    */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
