package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native scalar folds over the `collect_list(x) OVER w` window
  * arrays of the factor tier — the r20 optimization replacement for
  * the interpreted HOF chains (`filter`/`zip_with`/`aggregate`
  * lambdas evaluate their body expression tree per ELEMENT, and the
  * alpha corpus runs ~90 such kernels per row over frames up to 60
  * deep; the r20 event-log profile put ~90% of the DAG's executor
  * time in the two stock-keyed window stages these run in). Same
  * shape as the earlier [[DoubleVecDot]]/[[LongVecFold]]/[[MomentsFold]]
  * replacements: a tight primitive loop, codegen'd inline, interpreted
  * eval sharing the same arithmetic.
  *
  * BIT-EXACTNESS CONTRACT (the reason each loop mirrors its HOF
  * original operation-for-operation, in index order):
  *  - comparisons use Spark SQL's double total order
  *    (`SQLOrderingUtil.compareDoubles`: -0.0 == 0.0, NaN largest,
  *    NaN == NaN) — identical to the `<`/`===` the HOF predicates
  *    lowered to;
  *  - float arithmetic keeps the HOF's association and operand order
  *    exactly (e.g. decay-linear folds `acc + (v · (double) weight)`
  *    left-to-right, denominator `((double)(n·(n+1))) / 2.0`);
  *  - null/empty conventions replicate the HOF lowering case by case
  *    (documented per expression).
  * Every consumer is pinned by hash-exact goldens (Alpha101Spec,
  * FactorSpec, GraftFunctionsSpec parity) and the driver's DuckDB
  * oracle, so a divergence in any convention fails loudly.
  */
object ArrayFolds {
  /** Spark SQL double total order — the comparator LessThan/EqualTo
    * lower to for DoubleType. */
  @inline def cmp(a: Double, b: Double): Int =
    org.apache.spark.sql.catalyst.util.SQLOrderingUtil.compareDoubles(a, b)
}

/** `lt + (eq + 1.0) / 2.0` of `x` within `arr` — the average-tie raw
  * ts_rank (scipy `rankdata(arr)[-1]`) of
  * [[graft.factors.Alpha101]]'s `tsRankAvg`, replacing two
  * `size(filter(arr, ...))` HOF passes. Null `x` or null `arr` →
  * null (the original wraps in `when(x.isNotNull, ...)`; the fold
  * subsumes the guard). Null ELEMENTS are skipped — a null predicate
  * result kept an element out of both filters. */
case class TsRankAvgFold(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    TsRankAvgFold.rank(a.asInstanceOf[ArrayData], b.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, x) =>
      s"${ev.value} = graft.expressions.TsRankAvgFold.rank($a, $x);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TsRankAvgFold =
    copy(left = newLeft, right = newRight)
}

object TsRankAvgFold {
  /** Called from both interpreted eval and generated code. */
  def rank(arr: ArrayData, x: Double): Double = {
    val n = arr.numElements()
    var lt = 0L; var eq = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val c = ArrayFolds.cmp(arr.getDouble(i), x)
        if (c < 0) lt += 1 else if (c == 0) eq += 1
      }
      i += 1
    }
    lt.toDouble + (eq.toDouble + 1.0) / 2.0
  }
}

/** `size(filter(arr, v <= last)) / size(arr)` — the (0,1] ordinal
  * ts_rank of [[graft.ops.TsOps.tsRankArr]] (and the
  * `graft_ts_rank` SQL function riding it). Edge conventions mirror
  * the HOF lowering exactly: an EMPTY array → 0.0/0.0 = NaN (never
  * null — both `size` operands are non-null); a null LAST element
  * (null `cur`) nulls every predicate, so the numerator is 0 and the
  * result 0.0/n; null elements are skipped in the numerator but
  * COUNTED in the denominator (`size` counts all slots). */
case class TsRankLeFold(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    TsRankLeFold.rank(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.TsRankLeFold.rank($a);")

  override protected def withNewChildInternal(newChild: Expression): TsRankLeFold =
    copy(child = newChild)
}

object TsRankLeFold {
  def rank(arr: ArrayData): Double = {
    val n = arr.numElements()
    var le = 0L
    if (n > 0 && !arr.isNullAt(n - 1)) {
      val cur = arr.getDouble(n - 1)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i) && ArrayFolds.cmp(arr.getDouble(i), cur) <= 0) le += 1
        i += 1
      }
    }
    le.toDouble / n.toDouble
  }
}

/** Linear-decay weighted mean, weights 1..n oldest-to-newest:
  * `aggregate(zip_with(arr, sequence(1, n), (v, wt) => v·wt), 0.0,
  * ...) / (n·(n+1)/2.0)` in one pass.
  *
  *  - `nullSlot = false` ([[graft.ops.TsOps.decayLinearArr]] and the
  *    `graft_decay_linear` SQL function): plain left fold; a null
  *    element nulls the result (the HOF's `acc + null` was sticky),
  *    and so does an EMPTY array — `sequence(1, 0)` descends to
  *    [1, 0], `zip_with` null-pads the empty value side, and the
  *    null products poison the fold.
  *  - `nullSlot = true` ([[graft.factors.Alpha101]]'s `dlNullSlot`):
  *    elements are NaN-marked nulls that keep their weight slot but
  *    contribute nothing; an all-NaN array → null (the original's
  *    `when(exists(arr, !isnan), ...)` guard). */
case class DecayLinearFold(child: Expression, nullSlot: Boolean)
  extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    DecayLinearFold.fold(a.asInstanceOf[ArrayData], nullSlot)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val v = ctx.freshName("v")
      s"""
         |java.lang.Double $v = graft.expressions.DecayLinearFold.fold($a, $nullSlot);
         |if ($v == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $v.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): DecayLinearFold =
    copy(child = newChild)
}

object DecayLinearFold {
  /** Boxed return: null for the all-NaN (nullSlot) and null-element
    * (dense) cases. Arithmetic order mirrors the HOF exactly:
    * per element `acc + (v · (double) weight)` left-to-right, then
    * one divide by `((double)(n·(n+1))) / 2.0`. */
  def fold(arr: ArrayData, nullSlot: Boolean): java.lang.Double = {
    val n = arr.numElements()
    if (!nullSlot && n == 0) return null // see the empty-array note above
    var acc = 0.0
    var any = false
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        if (!nullSlot) return null // HOF: acc + null poisons the fold
      } else {
        val v = arr.getDouble(i)
        if (nullSlot) {
          // zip_with's product is NaN iff v is NaN (weights are
          // finite non-zero ints); the original skips NaN products
          // and its exists-guard checks the raw elements
          if (!java.lang.Double.isNaN(v)) { any = true; acc += v * (i + 1).toDouble }
        } else {
          acc += v * (i + 1).toDouble
        }
      }
      i += 1
    }
    if (nullSlot && !any) null
    else java.lang.Double.valueOf(acc / ((n * (n + 1)).toDouble / 2.0))
  }
}

/** Sequential product fold: `aggregate(arr, 1.0, (acc, v) => acc·v)`
  * with the original's `when(size(arr) > 0, ...)` empty guard
  * ([[graft.factors.Alpha101]]'s `tsProd` /
  * [[graft.ops.TsOps.tsProduct]]). Null element → null (sticky
  * `acc·null`). */
case class ProdFold(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    ProdFold.fold(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val v = ctx.freshName("v")
      s"""
         |java.lang.Double $v = graft.expressions.ProdFold.fold($a);
         |if ($v == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $v.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ProdFold =
    copy(child = newChild)
}

object ProdFold {
  def fold(arr: ArrayData): java.lang.Double = {
    val n = arr.numElements()
    if (n == 0) return null
    var acc = 1.0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      acc *= arr.getDouble(i)
      i += 1
    }
    acc
  }
}

/** Mean absolute deviation of the array around a PRECOMPUTED center:
  * `aggregate(arr, 0.0, (acc, v) => acc + abs(v − m)) / size(arr)` —
  * the cci_14 mean-deviation kernel in [[graft.factors.Technical]].
  * Empty array → 0.0/0 = NaN as the original; null element → null
  * (sticky fold). */
case class MeanAbsDevFold(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    MeanAbsDevFold.fold(a.asInstanceOf[ArrayData], b.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, m) => {
      val v = ctx.freshName("v")
      s"""
         |java.lang.Double $v = graft.expressions.MeanAbsDevFold.fold($a, $m);
         |if ($v == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $v.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MeanAbsDevFold =
    copy(left = newLeft, right = newRight)
}

object MeanAbsDevFold {
  def fold(arr: ArrayData, m: Double): java.lang.Double = {
    val n = arr.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      acc += java.lang.Math.abs(arr.getDouble(i) - m)
      i += 1
    }
    acc / n.toDouble
  }
}
