package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridge for custom Catalyst expressions.
  * Spark 4 moved these conversions behind `private[sql]`
  * (org.apache.spark.sql.classic.ExpressionUtils); extension libraries
  * conventionally expose them via a same-package shim.
  */
object GraftShim {
  def toColumn(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def toExpression(spark: SparkSession, c: Column): Expression =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].expression(c)

  /** True when the session's CacheManager holds no `persist()` entries
    * (localCheckpoint RDD blocks are NOT tracked here — the
    * ContextCleaner manages those). The iterative operators' no-leak
    * contract is "the manager is as empty after the call as before";
    * CacheLeakSpec pins it.
    */
  def cacheManagerEmpty(spark: SparkSession): Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager.isEmpty

  /** Drop every CacheManager entry (test isolation helper). */
  def clearAllCache(spark: SparkSession): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager.clearCache()

  /** Register a temp SQL function backed by a raw Catalyst expression
    * builder on an already-running session (the extensions path covers
    * new sessions; this covers `SparkSession.active`).
    */
  def registerTempFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
