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
