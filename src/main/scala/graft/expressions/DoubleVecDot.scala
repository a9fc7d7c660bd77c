package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Σ aᵢ·bᵢ over two array<double> columns — a native Catalyst
  * expression with codegen, replacing the interpreted
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` HOF chain in the ANN /
  * LSH hot paths (HOF lambda bodies are interpreted per element; the
  * tight primitive loop removes that per-element overhead and keeps
  * the whole dot product inside whole-stage codegen).
  *
  * Accumulation is sequential in ascending index order — the SAME
  * association as the HOF it replaces and as DuckDB's
  * `list_dot_product` — so every existing oracle hash is unchanged.
  *
  * Preconditions (guaranteed by the vector callers, not checked):
  * equal lengths, no null elements.
  */
case class DoubleVecDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    var i = 0; var acc = 0.0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |double $acc = 0.0;
         |final int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DoubleVecDot =
    copy(left = newLeft, right = newRight)
}
