package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.UnsafeRow
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.{ExternalAppendOnlyUnsafeRowArray, SparkStrategy}

/** Bridge into the `private[sql]` classic plan constructors, for
  * mounting graft's custom logical operators (e.g.
  * [[graft.plans.MultiRankNode]]) into a DataFrame chain and
  * registering their planning strategies. */
object PlanBridge {

  /** The analyzed logical plan under a DataFrame (attribute-resolved,
    * so custom operators can bind inputs by `Attribute`). */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution.analyzed

  /** Wrap a logical plan back into a DataFrame on `session`. */
  def ofRows(session: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      session.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Estimated split count of the frame's underlying file scan:
    * ceil(file bytes / maxPartitionBytes), from the relation's file
    * index — the DataFrame-native answer to "is this scan tiny?",
    * without materializing an RDD lineage the way `df.rdd
    * .getNumPartitions` does. None when the frame isn't a bare file
    * scan (caller should then assume it is already parallel). */
  def scanSplitEstimate(df: DataFrame): Option[Long] =
    analyzed(df).collectFirst {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        val bytes = l.relation.sizeInBytes
        val per = org.apache.spark.sql.internal.SQLConf.get.filesMaxPartitionBytes
        math.max(1L, (bytes + per - 1) / per)
    }

  /** Idempotently register a planning strategy on the session
    * (read dynamically by the planner, including under AQE). */
  def installStrategy(session: SparkSession, s: SparkStrategy): Unit = {
    val exp = session.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    exp.synchronized {
      if (!exp.extraStrategies.contains(s)) exp.extraStrategies = s +: exp.extraStrategies
    }
  }
}

/** Task-local spillable row buffer — WindowExec's partition buffer
  * ([[ExternalAppendOnlyUnsafeRowArray]], `private[sql]`) re-exported
  * for graft's physical operators. Must be constructed inside a task
  * (it binds the running TaskContext for spilling). Thresholds are
  * the same session confs WindowExec reads, captured driver-side. */
final class SpillableRowBuffer(
    numRowsInMemory: Int, numRowsSpill: Int, sizeBytesSpill: Long) {
  private val buf = new ExternalAppendOnlyUnsafeRowArray(
    numRowsInMemory, sizeBytesSpill, numRowsSpill, sizeBytesSpill)
  /** Copies the row internally; safe to call with a reused stream row. */
  def add(r: UnsafeRow): Unit = buf.add(r)
  def length: Int = buf.length
  def iterator: Iterator[UnsafeRow] = buf.generateIterator()
  def clear(): Unit = buf.clear()
}
