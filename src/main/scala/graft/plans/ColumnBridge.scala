package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark 4's `private[sql]` Column <-> Expression
  * converters, so custom Catalyst `Expression`s (graft.dedup.SimHash64
  * and friends) can be exposed as user-facing `Column`s. Lives in the
  * `org.apache.spark.sql` namespace solely to satisfy the access
  * qualifier; contains no Spark-internal logic.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eager ColumnNode -> Expression conversion. `expression` wraps the
    * node lazily (ColumnNodeExpression), which only the classic Dataset
    * paths unwrap; an expression returned from a FunctionRegistry
    * builder never is, and dies at codegen. This converts up front to a
    * plain Catalyst tree (UnresolvedFunctions inside resolve normally). */
  def resolvedExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Wrap a hand-built LogicalPlan (e.g. graft.plans.AsOfJoinPlan) as
    * a DataFrame — `Dataset.ofRows` is `private[sql]` in Spark 4. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Analyzed logical plan of a DataFrame (for hand-built subquery
    * expressions — `queryExecution` lives on the classic Dataset). */
  def analyzed(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution.analyzed

  /** `localCheckpoint` that also RESETS plan statistics.
    *
    * Spark's localCheckpoint truncates lineage but PRESERVES the
    * origin plan's estimated `Statistics` on the resulting LogicalRDD
    * (`originStats`). In a driver-coordinated iterative loop (k-core
    * peeling, incremental core maintenance, connected components)
    * each round's frame is a product of JOINS over the previous
    * round's checkpoints, and with size-only estimation join size =
    * product of child sizes — so the BigInt `sizeInBytes` roughly
    * TRIPLES its bit length every round. After a few tens of rounds
    * the driver spends whole seconds inside
    * `BigInteger.multiplyToomCook3` just *planning* (measured: the
    * KCore maintenance spec crawled at 100% driver CPU in BigInteger
    * math). Dropping `originStats` falls back to
    * `defaultSizeInBytes`, exactly what a freshly-parallelized RDD
    * reports — joins against it already sat above every broadcast
    * threshold, so no join strategy changes; the estimate just stops
    * compounding. */
  def checkpointStatsReset(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val cp = df.localCheckpoint()
    val analyzedPlan = analyzed(cp)
    analyzedPlan match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        ofRows(df.sparkSession, lr.copy(
          lr.output, lr.rdd, lr.outputPartitioning, lr.outputOrdering,
          lr.isStreaming, lr.stream)(
          df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
          None, None))
      case _ => cp
    }
  }

  /** Register a SQL function builder on an EXISTING session —
    * `withExtensions` only applies at session creation, and the
    * FunctionRegistry is `private[sql]`. */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(ident, info, builder)
}
