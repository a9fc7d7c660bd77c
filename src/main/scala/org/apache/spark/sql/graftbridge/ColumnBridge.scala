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

  /** Partition-key name lists of every window expression inside an
    * UNRESOLVED Column (empty for non-window expressions). Used by
    * [[graft.ops.PlanOps]] to classify derived-column definitions by
    * the exchange their window would require. */
  def windowPartitionKeys(c: Column): Seq[Seq[String]] = {
    val out = Seq.newBuilder[Seq[String]]
    def names(a: Any): Seq[String] = a match {
      case ua: org.apache.spark.sql.internal.UnresolvedAttribute =>
        Seq(ua.nameParts.mkString("."))
      case p: Product => p.productIterator.toSeq.flatMap(names)
      case it: Iterable[_] => it.toSeq.flatMap(names)
      case _ => Seq.empty
    }
    def walk(a: Any): Unit = a match {
      case w: org.apache.spark.sql.internal.Window =>
        out += names(w.windowSpec.partitionColumns)
        walk(w.windowFunction); w.windowSpec.partitionColumns.foreach(walk)
        w.windowSpec.sortColumns.foreach(walk)
      case p: Product => p.productIterator.foreach(walk)
      case it: Iterable[_] => it.foreach(walk)
      case _ => ()
    }
    walk(c.node)
    out.result()
  }

  /** `Some(name)` iff the Column is a bare single-part attribute
    * reference (`col("x")`), i.e. needs no hoisted projection when
    * used as a rank input. */
  def simpleColumnName(c: Column): Option[String] = c.node match {
    case ua: org.apache.spark.sql.internal.UnresolvedAttribute
        if ua.nameParts.size == 1 => Some(ua.nameParts.head)
    case _ => None
  }

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
