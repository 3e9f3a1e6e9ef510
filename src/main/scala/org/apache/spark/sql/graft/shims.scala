package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` surface: Column ⇄ Expression conversion
  * for our custom Catalyst expressions. This is the standard extension
  * seam for third-party Catalyst expressions on Spark 4 (the classic
  * Column no longer exposes a public Expression constructor).
  */
object shims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      id: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(id, info, builder)

  /** Column → catalyst Expression through the session's converter —
    * unlike [[expression]] (a lazy `ColumnNodeExpression` wrapper, fine
    * inside Dataset API calls which convert it themselves), this eagerly
    * lowers the column node tree (incl. `.desc` sort-order nodes) to
    * real catalyst expressions, which a CUSTOM logical node needs: the
    * analyzer resolves `UnresolvedAttribute`s inside unknown operators,
    * but never converts column-node wrappers there.
    */
  def catalystExpression(spark: org.apache.spark.sql.SparkSession,
      c: Column): Expression =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].expression(c)

  /** Wrap a (possibly custom) logical plan as a DataFrame — the seam a
    * custom logical operator needs to enter the public Dataset API
    * (classic `Dataset.ofRows` is `private[sql]` on Spark 4).
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The analyzed logical plan behind a DataFrame (resolved attributes —
    * what a custom logical node's key/order expressions must reference).
    */
  def analyzedPlan(df: org.apache.spark.sql.Dataset[_])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed

  /** The materialized RDD behind a `localCheckpoint(true)`d Dataset.
    * `Dataset.unpersist` is a no-op for checkpoint blocks (they are not
    * registered with the CacheManager), so eager per-round freeing in
    * iterative loops must unpersist THIS RDD directly; without it the
    * blocks linger until the ContextCleaner happens to GC the reference.
    */
  def checkpointedRdd(df: org.apache.spark.sql.Dataset[_])
      : Option[org.apache.spark.rdd.RDD[_]] =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }
}
