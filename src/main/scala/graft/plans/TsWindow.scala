package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, CurrentRow, Expression, GenericInternalRow, JoinedRow, Literal, NamedExpression, RowFrame, SortOrder, SpecifiedWindowFrame, UnboundedPreceding, UnsafeProjection, UnsafeRow, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, CollectList, Complete, Count, Max, Min, StddevSamp, Sum}
import org.apache.spark.sql.catalyst.expressions.{Lag, Lead}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window => LogicalWindow}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.SQLOrderingUtil
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.SpillableRowBuffer
import org.apache.spark.sql.types._

/** Batched TIME-SERIES window evaluation: every supported rolling /
  * running / offset window expression of one entity-keyed Window
  * operator computed in a single pass over the in-memory group with
  * primitive state — the TS sibling of [[MultiRankNode]] (r20
  * optimization round).
  *
  * Why this exists (measured, r20): the alpha corpus's two
  * stock-keyed window stages hold ~90% of the DAG's executor time,
  * and the thread-dump profile shows the cost is WindowExec's
  * machinery, not the arithmetic — per output row Spark re-evaluates
  * every aggregate's INPUT EXPRESSION once per visited frame row
  * (`sum(when(b, x*x))` over a 250-row frame recomputes the
  * conditional product 250× per row), per task it re-generates and
  * looks up the frame processors' projection SOURCE (
  * `GenerateMutableProjection` + regex canonicalization showed in
  * 17% of runnable samples), and `collect_list` boxes every visited
  * element into an `ArrayBuffer[Any]`. This node evaluates each
  * input expression ONCE per row into primitive columns, then runs
  * tight per-function loops over them.
  *
  * BIT-EXACTNESS (the swap must never move a value — the driver
  * re-hashes every entry): every kernel replays Spark's own
  * accumulation order operation-for-operation —
  *  - sliding frames re-aggregate per output row, oldest→newest,
  *    from the same zero/null-start buffer semantics
  *    (`sum`: null until the first non-null, which adds to 0.0;
  *    `avg`: sum starts 0.0 and adds `coalesce(v, 0.0)` — the
  *    null-input `+0.0` is kept because `-0.0 + 0.0` flips the zero
  *    sign);
  *  - running (unbounded-preceding) frames accumulate incrementally
  *    in row order — the same left fold Spark's unbounded frame does;
  *  - min/max tie-keeping and all double comparisons use
  *    `SQLOrderingUtil.compareDoubles` (the `least`/`greatest`
  *    ordering);
  *  - stddev_samp replays `CentralMomentAgg`'s exact update
  *    recurrence (n, avg, m2 with deltaN) over non-null inputs and
  *    its divide-before-sqrt eval;
  *  - collect_list drops nulls and preserves row order (the values
  *    land in an [[org.apache.spark.sql.catalyst.util.GenericArrayData]]
  *    exactly as the ImperativeAggregate's buffer copy would).
  * Anything not in the supported set — range frames, rank functions,
  * partition-only specs, distinct/filtered aggregates, ignoreNulls
  * offsets, non-literal defaults — leaves the WHOLE operator on
  * Spark's WindowExec (the strategy matches all-or-nothing), and
  * `GRAFT_TS_WINDOW=spark` disables the lowering globally for A/B.
  * Parity is pinned by TsWindowSpec's randomized window-vs-node
  * property cases (nulls, -0.0, NaN, ties) plus the hash-exact
  * Alpha101/Factor goldens and the driver's DuckDB oracle.
  *
  * At 100 TB the plan shape is unchanged — same exchanges, same
  * sort, same operator boundaries (the node REQUIRES the clustering
  * + ordering WindowExec required and preserves the child's) — only
  * the per-group evaluation is replaced.
  */
object TsWindowStrategy extends SparkStrategy {
  /** Lowering gate: session conf `spark.graft.tsWindow` (runtime
    * A/B + the spec's fallback-parity probe), defaulting to the
    * GRAFT_TS_WINDOW env (external escape hatch); any value other
    * than "spark"/"window" lowers. */
  private def enabled: Boolean = {
    val mode = try {
      org.apache.spark.sql.internal.SQLConf.get.getConfString(
        "spark.graft.tsWindow", sys.env.getOrElse("GRAFT_TS_WINDOW", "exec"))
    } catch { case _: Exception => "exec" }
    mode != "spark" && mode != "window"
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case w: LogicalWindow if enabled =>
      TsWindowExec.plan(w, planLater(w.child)).toSeq
    case _ => Nil
  }
}

private[plans] object TsFnKind {
  val SumD = 0; val SumL = 1; val AvgD = 2; val MinD = 3; val MaxD = 4
  val MinL = 5; val MaxL = 6; val CountRows = 7; val CountNonNull = 8
  val Stddev = 9; val CollectD = 10; val Offset = 11
}

/** One supported window function: `kind` (TsFnKind), `input` ordinal
  * into the input projection (-1 for countRows), `span` = frame
  * length in rows (Int.MaxValue = unbounded preceding), `offset` for
  * lag/lead (negative = lag), `nullOnOne` = stddev_samp's
  * nullOnDivideByZero. */
private[plans] final case class TsFnSpec(kind: Int, input: Int, span: Int,
    offset: Int = 0, nullOnOne: Boolean = true)

case class TsWindowExec(
    wexprs: Seq[NamedExpression],
    fns: Seq[TsFnSpec],
    inputs: Seq[Expression],
    partKeys: Seq[Expression],
    orderSpec: Seq[SortOrder],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ wexprs.map(_.toAttribute)
  override def producedAttributes: AttributeSet =
    AttributeSet(wexprs.map(_.toAttribute))
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(partKeys))
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(partKeys.map(SortOrder(_, Ascending)) ++ orderSpec)
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering
  override protected def withNewChildInternal(newChild: SparkPlan): TsWindowExec =
    copy(child = newChild)

  protected override def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyOrds = partKeys.map {
      case a: Attribute =>
        val o = childOutput.indexWhere(_.exprId == a.exprId)
        require(o >= 0, s"group key $a not found in child output")
        o
      case e => throw new IllegalStateException(s"non-attribute group key $e")
    }.toArray
    val keyTypes = partKeys.map(_.dataType).toArray
    val inputExprs = inputs.toArray
    val inputIsDouble = inputExprs.map(_.dataType == DoubleType)
    val fnArr = fns.toArray
    val outputTypes = output.map(_.dataType).toArray
    val memRows = conf.windowExecBufferInMemoryThreshold
    val spillRows = conf.windowExecBufferSpillThreshold
    val spillBytes = conf.windowExecBufferSpillSizeThreshold
    child.execute().mapPartitions { iter =>
      if (!iter.hasNext) Iterator.empty
      else new TsWindowGroupIterator(iter, childOutput, outputTypes,
        keyOrds, keyTypes, inputExprs, inputIsDouble, fnArr,
        memRows, spillRows, spillBytes)
    }
  }
}

object TsWindowExec {

  /** Try to lower a logical Window; None → Spark's WindowExec. */
  def plan(w: LogicalWindow, child: SparkPlan): Option[TsWindowExec] = {
    // entity-keyed ordered specs only: attribute partition keys and a
    // single ascending attribute ordering (the TS shape — the panel's
    // (stock, day)); partition-only XS specs keep WindowExec
    if (w.partitionSpec.isEmpty ||
        !w.partitionSpec.forall(_.isInstanceOf[Attribute])) return None
    if (w.orderSpec.size != 1) return None
    val so = w.orderSpec.head
    if (so.direction != Ascending || !so.child.isInstanceOf[Attribute]) return None

    val inputs = Vector.newBuilder[Expression]
    var inputKeys = Map.empty[Expression, Int] // canonicalized → ordinal
    var nInputs = 0
    def inputOrd(e: Expression): Int = {
      if (e.dataType != DoubleType && e.dataType != LongType) return -2
      if (!e.deterministic) return -2
      val key = e.canonicalized
      inputKeys.get(key) match {
        case Some(i) => i
        case None =>
          inputs += e; inputKeys += (key -> nInputs); nInputs += 1; nInputs - 1
      }
    }

    // frame bounds can be folded literals or constant expressions
    // (lag's resolved frame carries UnaryMinus(Literal(k)))
    def constInt(e: Expression): Option[Int] = e match {
      case Literal(v: Int, IntegerType) => Some(v)
      case _ if e.foldable && e.dataType == IntegerType =>
        Option(e.eval(null)).map(_.asInstanceOf[Int])
      case _ => None
    }

    def rowSpan(frame: Expression): Int = frame match {
      case SpecifiedWindowFrame(RowFrame, lo, CurrentRow) => lo match {
        case UnboundedPreceding => Int.MaxValue
        case CurrentRow => 1
        case e => constInt(e) match {
          case Some(v) if v <= 0 => 1 - v
          case _ => -1
        }
      }
      case _ => -1
    }

    val specs = Vector.newBuilder[TsFnSpec]
    val ok = w.windowExpressions.forall {
      case a: org.apache.spark.sql.catalyst.expressions.Alias => a.child match {
        case WindowExpression(fn, WindowSpecDefinition(_, _, frame)) => fn match {
          case ae: AggregateExpression
              if ae.mode == Complete && !ae.isDistinct && ae.filter.isEmpty =>
            val span = rowSpan(frame)
            if (span < 0) false
            else ae.aggregateFunction match {
              case Sum(c, _) if c.dataType == DoubleType || c.dataType == LongType =>
                val i = inputOrd(c); if (i < 0) false else {
                  specs += TsFnSpec(
                    if (c.dataType == DoubleType) TsFnKind.SumD else TsFnKind.SumL,
                    i, span); true
                }
              case Average(c, _) if c.dataType == DoubleType =>
                val i = inputOrd(c); if (i < 0) false else {
                  specs += TsFnSpec(TsFnKind.AvgD, i, span); true
                }
              case Min(c) if c.dataType == DoubleType || c.dataType == LongType =>
                val i = inputOrd(c); if (i < 0) false else {
                  specs += TsFnSpec(
                    if (c.dataType == DoubleType) TsFnKind.MinD else TsFnKind.MinL,
                    i, span); true
                }
              case Max(c) if c.dataType == DoubleType || c.dataType == LongType =>
                val i = inputOrd(c); if (i < 0) false else {
                  specs += TsFnSpec(
                    if (c.dataType == DoubleType) TsFnKind.MaxD else TsFnKind.MaxL,
                    i, span); true
                }
              case Count(Seq(c)) =>
                c match {
                  case l: Literal if l.value != null =>
                    specs += TsFnSpec(TsFnKind.CountRows, -1, span); true
                  case _ =>
                    val i = inputOrd(c); if (i < 0) false else {
                      specs += TsFnSpec(TsFnKind.CountNonNull, i, span); true
                    }
                }
              case s: StddevSamp if s.child.dataType == DoubleType =>
                val i = inputOrd(s.child); if (i < 0) false else {
                  specs += TsFnSpec(TsFnKind.Stddev, i, span,
                    nullOnOne = s.nullOnDivideByZero); true
                }
              case cl: CollectList if cl.child.dataType == DoubleType =>
                val i = inputOrd(cl.child); if (i < 0) false else {
                  specs += TsFnSpec(TsFnKind.CollectD, i, span); true
                }
              case _ => false
            }
          // frameless offsets: lag/lead with literal offset, literal
          // null default, respectNulls — read the offset from the
          // resolved frame bounds (lo == hi == the physical offset)
          case off @ (_: Lag | _: Lead) =>
            val (in, default, ignoreNulls) = off match {
              case Lag(i, _, d, ig) => (i, d, ig)
              case Lead(i, _, d, ig) => (i, d, ig)
            }
            (frame match {
              case SpecifiedWindowFrame(RowFrame, lo, hi)
                  if lo.semanticEquals(hi) => constInt(lo)
              case _ => None
            }) match {
              case Some(k) if !ignoreNulls && isNullLiteral(default) =>
                val i = inputOrd(in)
                if (i < 0) false else {
                  specs += TsFnSpec(TsFnKind.Offset, i, 0, offset = k); true
                }
              case _ => false
            }
          case _ => false
        }
        case _ => false
      }
      case _ => false
    }
    if (!ok) None
    else Some(TsWindowExec(w.windowExpressions, specs.result(),
      inputs.result(), w.partitionSpec, w.orderSpec, child))
  }

  private def isNullLiteral(e: Expression): Boolean = e match {
    case Literal(null, _) => true
    case _ => false
  }
}

/** Streams (partition-key) groups: buffer one group, evaluate the
  * input projection once per row into primitive columns, compute
  * every function's output column with tight loops, emit joined
  * rows. Memory: the spillable row buffer plus an UNSPILLABLE block
  * of (#inputs + #scalar outputs) × n primitives per group —
  * collect_list outputs are materialized per EMITTED row from the
  * input column, never all at once. */
private final class TsWindowGroupIterator(
    input: Iterator[InternalRow],
    childOutput: Seq[Attribute],
    outputTypes: Array[DataType],
    keyOrds: Array[Int], keyTypes: Array[DataType],
    inputExprs: Array[Expression], inputIsDouble: Array[Boolean],
    fns: Array[TsFnSpec],
    memRows: Int, spillRows: Int, spillBytes: Long) extends Iterator[InternalRow] {

  private val numFns = fns.length
  private val numIn = inputExprs.length
  private val join = new JoinedRow
  private val proj = UnsafeProjection.create(outputTypes)
  private val inProj = UnsafeProjection.create(inputExprs.toIndexedSeq, childOutput)
  private val buffer = new SpillableRowBuffer(memRows, spillRows, spillBytes)
  private val fnRow = new GenericInternalRow(numFns)
  private val toUnsafe = UnsafeProjection.create(
    outputTypes.dropRight(numFns))
  private def unsafe(r: InternalRow): UnsafeRow = r match {
    case u: UnsafeRow => u
    case o => toUnsafe(o)
  }

  private var pendingHead: UnsafeRow = unsafe(input.next()).copy()
  private var groupSize = 0
  private var groupPos = 0
  private var groupRows: Iterator[UnsafeRow] = Iterator.empty
  // input columns (primitive) + null flags for the current group
  private var inD: Array[Array[Double]] = _
  private var inL: Array[Array[Long]] = _
  private var inNull: Array[Array[Boolean]] = _
  // scalar outputs (primitive) + null flags; collect-list outputs are
  // built per emitted row
  private var outD: Array[Array[Double]] = _
  private var outL: Array[Array[Long]] = _
  private var outNull: Array[Array[Boolean]] = _

  override def hasNext: Boolean = groupPos < groupSize || pendingHead != null

  override def next(): InternalRow = {
    if (groupPos == groupSize) startNextGroup()
    val r = groupRows.next()
    val i = groupPos
    var j = 0
    while (j < numFns) {
      val f = fns(j)
      f.kind match {
        case TsFnKind.CollectD =>
          fnRow.update(j, collectArray(f, i))
        case TsFnKind.SumL | TsFnKind.MinL | TsFnKind.MaxL |
             TsFnKind.CountRows | TsFnKind.CountNonNull =>
          if (outNull(j)(i)) fnRow.setNullAt(j) else fnRow.update(j, outL(j)(i))
        case TsFnKind.Offset =>
          val src = i + fns(j).offset
          if (src < 0 || src >= groupSize || inNull(f.input)(src)) fnRow.setNullAt(j)
          else if (inputIsDouble(f.input)) fnRow.update(j, inD(f.input)(src))
          else fnRow.update(j, inL(f.input)(src))
        case _ =>
          if (outNull(j)(i)) fnRow.setNullAt(j) else fnRow.update(j, outD(j)(i))
      }
      j += 1
    }
    groupPos += 1
    proj(join(r, fnRow))
  }

  private def collectArray(f: TsFnSpec, i: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val lo = if (f.span == Int.MaxValue) 0 else math.max(0, i - (f.span - 1))
    val vals = inD(f.input); val nulls = inNull(f.input)
    var m = 0
    var j = lo
    while (j <= i) { if (!nulls(j)) m += 1; j += 1 }
    val out = new Array[Double](m)
    var k = 0; j = lo
    while (j <= i) { if (!nulls(j)) { out(k) = vals(j); k += 1 }; j += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  private def sameKeys(a: InternalRow, b: InternalRow): Boolean = {
    var i = 0
    while (i < keyOrds.length) {
      val ord = keyOrds(i)
      val an = a.isNullAt(ord); val bn = b.isNullAt(ord)
      val eq =
        if (an || bn) an && bn
        else keyTypes(i) match {
          case LongType => a.getLong(ord) == b.getLong(ord)
          case IntegerType | DateType => a.getInt(ord) == b.getInt(ord)
          case _ => a.get(ord, keyTypes(i)) == b.get(ord, keyTypes(i))
        }
      if (!eq) return false
      i += 1
    }
    true
  }

  private def startNextGroup(): Unit = {
    buffer.clear()
    val head = pendingHead
    pendingHead = null
    buffer.add(head)
    var break = false
    while (!break && input.hasNext) {
      val r = unsafe(input.next())
      if (sameKeys(head, r)) buffer.add(r)
      else { pendingHead = r.copy(); break = true }
    }
    val n = buffer.length
    inD = new Array[Array[Double]](numIn)
    inL = new Array[Array[Long]](numIn)
    inNull = Array.ofDim[Boolean](numIn, n)
    var c = 0
    while (c < numIn) {
      if (inputIsDouble(c)) inD(c) = new Array[Double](n)
      else inL(c) = new Array[Long](n)
      c += 1
    }
    var i = 0
    val gather = buffer.iterator
    while (gather.hasNext) {
      val pr = inProj(gather.next())
      var j = 0
      while (j < numIn) {
        if (pr.isNullAt(j)) inNull(j)(i) = true
        else if (inputIsDouble(j)) inD(j)(i) = pr.getDouble(j)
        else inL(j)(i) = pr.getLong(j)
        j += 1
      }
      i += 1
    }
    outD = new Array[Array[Double]](numFns)
    outL = new Array[Array[Long]](numFns)
    outNull = Array.ofDim[Boolean](numFns, n)
    var j = 0
    while (j < numFns) {
      val f = fns(j)
      f.kind match {
        case TsFnKind.SumD => sumD(f, n, j)
        case TsFnKind.SumL => sumL(f, n, j)
        case TsFnKind.AvgD => avgD(f, n, j)
        case TsFnKind.MinD => extremeD(f, n, j, wantMin = true)
        case TsFnKind.MaxD => extremeD(f, n, j, wantMin = false)
        case TsFnKind.MinL => extremeL(f, n, j, wantMin = true)
        case TsFnKind.MaxL => extremeL(f, n, j, wantMin = false)
        case TsFnKind.CountRows => countRows(f, n, j)
        case TsFnKind.CountNonNull => countNonNull(f, n, j)
        case TsFnKind.Stddev => stddev(f, n, j)
        case TsFnKind.CollectD | TsFnKind.Offset => () // emit-time
      }
      j += 1
    }
    groupSize = n
    groupPos = 0
    groupRows = buffer.iterator
  }

  // every sliding kernel recomputes per output row over
  // [max(0, i-span+1) .. i] in ascending order — Spark's own frame
  // scan order — and the unbounded case accumulates incrementally
  // (the identical left fold)

  private def sumD(f: TsFnSpec, n: Int, j: Int): Unit = {
    val vals = inD(f.input); val nulls = inNull(f.input)
    val out = new Array[Double](n); outD(j) = out
    val on = outNull(j)
    if (f.span == Int.MaxValue) {
      var acc = 0.0; var any = false
      var i = 0
      while (i < n) {
        if (!nulls(i)) { any = true; acc += vals(i) }
        if (any) out(i) = acc else on(i) = true
        i += 1
      }
    } else {
      var i = 0
      while (i < n) {
        val lo = math.max(0, i - (f.span - 1))
        var acc = 0.0; var any = false
        var k = lo
        while (k <= i) { if (!nulls(k)) { any = true; acc += vals(k) }; k += 1 }
        if (any) out(i) = acc else on(i) = true
        i += 1
      }
    }
  }

  private def sumL(f: TsFnSpec, n: Int, j: Int): Unit = {
    val vals = inL(f.input); val nulls = inNull(f.input)
    val out = new Array[Long](n); outL(j) = out
    val on = outNull(j)
    if (f.span == Int.MaxValue) {
      var acc = 0L; var any = false
      var i = 0
      while (i < n) {
        if (!nulls(i)) { any = true; acc += vals(i) }
        if (any) out(i) = acc else on(i) = true
        i += 1
      }
    } else {
      var i = 0
      while (i < n) {
        val lo = math.max(0, i - (f.span - 1))
        var acc = 0L; var any = false
        var k = lo
        while (k <= i) { if (!nulls(k)) { any = true; acc += vals(k) }; k += 1 }
        if (any) out(i) = acc else on(i) = true
        i += 1
      }
    }
  }

  /** Average's buffer sum starts at 0.0 and adds `coalesce(v, 0.0)`
    * for EVERY visited row — the null-input `+0.0` is replayed (it
    * turns a `-0.0` partial sum into `+0.0`). */
  private def avgD(f: TsFnSpec, n: Int, j: Int): Unit = {
    val vals = inD(f.input); val nulls = inNull(f.input)
    val out = new Array[Double](n); outD(j) = out
    val on = outNull(j)
    if (f.span == Int.MaxValue) {
      var acc = 0.0; var cnt = 0L
      var i = 0
      while (i < n) {
        if (nulls(i)) acc += 0.0 else { acc += vals(i); cnt += 1 }
        if (cnt > 0) out(i) = acc / cnt.toDouble else on(i) = true
        i += 1
      }
    } else {
      var i = 0
      while (i < n) {
        val lo = math.max(0, i - (f.span - 1))
        var acc = 0.0; var cnt = 0L
        var k = lo
        while (k <= i) {
          if (nulls(k)) acc += 0.0 else { acc += vals(k); cnt += 1 }
          k += 1
        }
        if (cnt > 0) out(i) = acc / cnt.toDouble else on(i) = true
        i += 1
      }
    }
  }

  /** least/greatest keep the FIRST of SQL-order ties (strict `<`/`>`
    * replacement only), via compareDoubles. */
  private def extremeD(f: TsFnSpec, n: Int, j: Int, wantMin: Boolean): Unit = {
    val vals = inD(f.input); val nulls = inNull(f.input)
    val out = new Array[Double](n); outD(j) = out
    val on = outNull(j)
    if (f.span == Int.MaxValue) {
      var cur = 0.0; var any = false
      var i = 0
      while (i < n) {
        if (!nulls(i)) {
          val v = vals(i)
          if (!any) { cur = v; any = true }
          else {
            val cm = SQLOrderingUtil.compareDoubles(v, cur)
            if (if (wantMin) cm < 0 else cm > 0) cur = v
          }
        }
        if (any) out(i) = cur else on(i) = true
        i += 1
      }
    } else {
      var i = 0
      while (i < n) {
        val lo = math.max(0, i - (f.span - 1))
        var cur = 0.0; var any = false
        var k = lo
        while (k <= i) {
          if (!nulls(k)) {
            val v = vals(k)
            if (!any) { cur = v; any = true }
            else {
              val cm = SQLOrderingUtil.compareDoubles(v, cur)
              if (if (wantMin) cm < 0 else cm > 0) cur = v
            }
          }
          k += 1
        }
        if (any) out(i) = cur else on(i) = true
        i += 1
      }
    }
  }

  private def extremeL(f: TsFnSpec, n: Int, j: Int, wantMin: Boolean): Unit = {
    val vals = inL(f.input); val nulls = inNull(f.input)
    val out = new Array[Long](n); outL(j) = out
    val on = outNull(j)
    var i = 0
    while (i < n) {
      val lo = if (f.span == Int.MaxValue) 0 else math.max(0, i - (f.span - 1))
      var cur = 0L; var any = false
      var k = lo
      while (k <= i) {
        if (!nulls(k)) {
          val v = vals(k)
          if (!any) { cur = v; any = true }
          else if (if (wantMin) v < cur else v > cur) cur = v
        }
        k += 1
      }
      if (any) out(i) = cur else on(i) = true
      i += 1
    }
  }

  private def countRows(f: TsFnSpec, n: Int, j: Int): Unit = {
    val out = new Array[Long](n); outL(j) = out
    var i = 0
    while (i < n) {
      val lo = if (f.span == Int.MaxValue) 0 else math.max(0, i - (f.span - 1))
      out(i) = (i - lo + 1).toLong
      i += 1
    }
  }

  private def countNonNull(f: TsFnSpec, n: Int, j: Int): Unit = {
    val nulls = inNull(f.input)
    val out = new Array[Long](n); outL(j) = out
    if (f.span == Int.MaxValue) {
      var acc = 0L
      var i = 0
      while (i < n) { if (!nulls(i)) acc += 1; out(i) = acc; i += 1 }
    } else {
      var i = 0
      while (i < n) {
        val lo = math.max(0, i - (f.span - 1))
        var acc = 0L
        var k = lo
        while (k <= i) { if (!nulls(k)) acc += 1; k += 1 }
        out(i) = acc
        i += 1
      }
    }
  }

  /** CentralMomentAgg's exact update recurrence over non-null
    * inputs; StddevSamp eval: n == 0 → null; n == 1 → null when
    * nullOnDivideByZero else NaN; else sqrt(m2 / (n - 1)). */
  private def stddev(f: TsFnSpec, n: Int, j: Int): Unit = {
    val vals = inD(f.input); val nulls = inNull(f.input)
    val out = new Array[Double](n); outD(j) = out
    val on = outNull(j)
    var i = 0
    while (i < n) {
      val lo = if (f.span == Int.MaxValue) 0 else math.max(0, i - (f.span - 1))
      var cn = 0.0; var avg = 0.0; var m2 = 0.0
      var k = lo
      while (k <= i) {
        if (!nulls(k)) {
          val v = vals(k)
          cn += 1.0
          val delta = v - avg
          val deltaN = delta / cn
          avg += deltaN
          m2 += delta * (delta - deltaN)
        }
        k += 1
      }
      if (cn == 0.0) on(i) = true
      else if (cn == 1.0) {
        if (f.nullOnOne) on(i) = true else out(i) = Double.NaN
      } else out(i) = math.sqrt(m2 / (cn - 1.0))
      i += 1
    }
  }
}
