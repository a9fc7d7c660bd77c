package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Bridge into the session's `private[sql]` function registry, so
  * [[graft.functions.GraftFunctions.register]] can install the graft
  * SQL functions on an ALREADY-RUNNING session (the driver builds the
  * session before our code runs, so the `SparkSessionExtensions` path
  * — [[graft.functions.GraftExtensions]] — is not available there).
  * `registerFunction` replaces an existing registration, so repeated
  * installs are idempotent. */
object FunctionBridge {
  def registerFunction(s: SparkSession, id: FunctionIdentifier,
      info: ExpressionInfo, builder: Seq[Expression] => Expression): Unit =
    s.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(id, info, builder)

  /** FULLY converts a Column's node tree into Catalyst expressions
    * (real `UnresolvedFunction`s the analyzer then resolves) — unlike
    * `ExpressionUtils.expression`, which wraps the tree in an opaque
    * `ColumnNodeExpression` leaf that a FunctionRegistry builder's
    * output must never contain (the analyzer cannot see into it and
    * codegen fails on the unresolved interior). */
  def toCatalyst(c: org.apache.spark.sql.Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)
}
