package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Integer sibling of [[DoubleVecDot]] for the exact-arithmetic
  * vector kernels: Σ aᵢ·bᵢ (`squaredDiff = false`, the q121 int8
  * ranking key and the q138 cosine numerator/norms) or Σ (aᵢ−bᵢ)²
  * (`squaredDiff = true`, the q137 k-means assignment distance).
  * Replaces the interpreted `aggregate(zip_with(...))` HOF chain
  * with a tight primitive loop inside whole-stage codegen.
  *
  * Long addition/multiplication are exact, so unlike the double
  * kernel there is no association caveat at all — any evaluation
  * order gives bit-identical results, and every existing oracle hash
  * is unchanged.
  *
  * Overflow discipline is the CALLER's contract (as everywhere in the
  * quantized tier): micro-unit components at dim 64 keep Σ(a−b)² and
  * Σ a·b far under 2^63; int8 components (±127) are smaller still.
  * ANSI-mode Java `long` arithmetic here wraps rather than throws —
  * callers keep inputs in range by construction (quantizers bound
  * magnitudes), matching the documented bounds in CorpusQueries.
  *
  * Null semantics mirror the HOF form exactly (so swapping the
  * kernel in can never silently change a value): a null ELEMENT in
  * either array, or unequal lengths (`zip_with` null-pads the
  * shorter side), nulls the whole result — the row then sorts last
  * in the ranking consumers, as it did under the interpreted chain.
  * The shipped quantizers never emit either case; the guard exists
  * so a future caller that does cannot rank on a silently-wrong sum.
  */
case class LongVecFold(left: Expression, right: Expression,
                       squaredDiff: Boolean)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var i = 0; var acc = 0L
    if (squaredDiff) {
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        val d = x.getLong(i) - y.getLong(i); acc += d * d; i += 1
      }
    } else {
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        acc += x.getLong(i) * y.getLong(i); i += 1
      }
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      val bad = ctx.freshName("bad")
      val body =
        if (squaredDiff)
          s"final long $d = $a.getLong($i) - $b.getLong($i); $acc += $d * $d;"
        else
          s"$acc += $a.getLong($i) * $b.getLong($i);"
      s"""
         |long $acc = 0L;
         |final int $n = $a.numElements();
         |boolean $bad = ($n != $b.numElements());
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; }
         |  else { $body }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongVecFold =
    copy(left = newLeft, right = newRight)
}
