package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` classic Column/Expression
  * converters, for registering graft's native Catalyst expressions
  * (e.g. [[graft.expressions.SortedLongIntersectCount]]) as Columns
  * without a FunctionRegistry round-trip. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Column names referenced by an UNRESOLVED Column. The classic
    * converter wraps the ColumnNode tree in a leaf
    * `ColumnNodeExpression`, so catalyst `collect` sees no children —
    * walk the internal node tree (all case classes) instead. Window
    * partition/order specs and lambda bodies are Products too, so
    * their references are included. */
  def referencedNames(c: Column): Set[String] = {
    val out = Set.newBuilder[String]
    def walk(a: Any): Unit = a match {
      case ua: org.apache.spark.sql.internal.UnresolvedAttribute =>
        out += ua.nameParts.mkString(".")
      case p: Product => p.productIterator.foreach(walk)
      case it: Iterable[_] => it.foreach(walk)
      case _ => ()
    }
    walk(c.node)
    out.result()
  }
}
