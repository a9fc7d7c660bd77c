package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, JoinedRow, GenericInternalRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.SQLOrderingUtil
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.SpillableRowBuffer
import org.apache.spark.sql.types._

/** Batched cross-sectional percentile rank: ALL pending pct-ranks of
  * one cross-section (partition key, e.g. trading day) computed in a
  * single pass over the in-memory group, instead of one
  * WindowExec-sorted window spec PER rank ordering.
  *
  * Why this exists: Spark's WindowExec architecture gives every
  * distinct ORDER BY one full Sort of the data. The Alpha101
  * pipeline (`database/functions/alpha101_engine.py:90-93`, re-
  * expressed in [[graft.factors.Alpha101]]) ranks ~130 distinct
  * orderings over the SAME day partitioning — as window specs that
  * is ~130 Sort operators over the full panel per derivation, even
  * though a single day's cross-section (~10^3-10^4 entities) fits
  * one executor's memory trivially. This node keeps the exchange
  * structure of the window formulation (it REQUIRES clustering by
  * the day key and PRESERVES child partitioning/ordering, so it
  * chains with adjacent day-keyed Window stages on one exchange) and
  * replaces the per-rank Sorts with per-group in-memory rank passes:
  * at 100 TB the cost is one shuffle + one single-key sort per
  * phase, then O(group · ranks · log group) CPU inside each day.
  *
  * Semantics are EXACTLY [[graft.ops.XsOps.rankPct]] (pandas
  * `rank(pct=True)`): average-tie rank over non-null inputs divided
  * by the non-null count; null input → null rank. Ordering uses
  * Spark's SQL double comparator (`SQLOrderingUtil.compareDoubles`:
  * -0.0 == 0.0, NaN largest) so ranks are bit-identical to the
  * window formulation — pinned by MultiRankSpec's window-parity
  * property test and the unchanged q90/q58/q91 oracle hashes.
  *
  * A rank's input is either a child column or an EARLIER rank's own
  * output attribute (rank-of-rank chains lower into one group pass).
  */
case class MultiRankNode(
    keys: Seq[Attribute],
    inputs: Seq[Attribute],
    rankOutput: Seq[Attribute],
    pct: Seq[Boolean], // per rank: true = pct rank, false = raw avg-tie rank
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output ++ rankOutput
  override def producedAttributes: AttributeSet = AttributeSet(rankOutput)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): MultiRankNode =
    copy(child = newChild)
}

object MultiRankStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case MultiRankNode(keys, ins, out, pct, child) =>
      MultiRankExec(keys, ins, out, pct, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class MultiRankExec(
    keys: Seq[Attribute],
    inputs: Seq[Attribute],
    rankOutput: Seq[Attribute],
    pct: Seq[Boolean],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ rankOutput
  override def producedAttributes: AttributeSet = AttributeSet(rankOutput)
  // one exchange per cross-sectional phase, shared with the phase's
  // Window operators: clustering (not exact hash) distribution, and
  // pass-through partitioning/ordering above
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(keys))
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(keys.map(k => SortOrder(k, Ascending)))
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering
  override protected def withNewChildInternal(newChild: SparkPlan): MultiRankExec =
    copy(child = newChild)

  protected override def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyOrds = keys.map { k =>
      val o = childOutput.indexWhere(_.exprId == k.exprId)
      require(o >= 0, s"group key $k not found in child output")
      o
    }.toArray
    // input source per rank: >=0 child ordinal, <0 = ~(earlier rank index)
    val srcOrds = inputs.zipWithIndex.map { case (a, j) =>
      val o = childOutput.indexWhere(_.exprId == a.exprId)
      if (o >= 0) o
      else {
        val r = rankOutput.indexWhere(_.exprId == a.exprId)
        require(r >= 0 && r < j,
          s"rank input $a is neither a child column nor an earlier rank")
        ~r
      }
    }.toArray
    val srcKinds = srcOrds.map { o => // 0 = double/float, 1 = integral
      if (o < 0) 0 // ranks are doubles
      else childOutput(o).dataType match {
        case DoubleType | FloatType => 0
        case LongType | IntegerType | ShortType | ByteType => 1
        case t => throw new IllegalArgumentException(s"unsupported rank input type $t")
      }
    }.toArray
    val keyTypes = keys.map(_.dataType).toArray
    val outputTypes = output.map(_.dataType).toArray
    val pctArr = pct.toArray
    val memRows = conf.windowExecBufferInMemoryThreshold
    val spillRows = conf.windowExecBufferSpillThreshold
    val spillBytes = conf.windowExecBufferSpillSizeThreshold
    child.execute().mapPartitions { iter =>
      if (!iter.hasNext) Iterator.empty
      else new MultiRankGroupIterator(iter, outputTypes, keyOrds, keyTypes,
        srcOrds, srcKinds, pctArr, memRows, spillRows, spillBytes)
    }
  }
}

/** Streams day-groups: buffer one group (spillable), compute all rank
  * columns for it, emit joined rows, move to the next group.
  *
  * MEMORY BOUND: besides the spillable row buffer, each group holds
  * ONE unspillable block of numRanks × n doubles (+ 1 byte of null
  * flag each, + a long gather array per integral-sourced rank) — the
  * rank values being emitted. This is the irreducible floor for a
  * node that emits rows row-major with every rank attached (gather
  * staging was folded into it by ranking in place), ~9·R·n bytes:
  * the reference's 5k-entity × ~130-rank cross-sections need ~6 MB
  * per task; a 100×-entity cross-section ~0.6 GB un-split — which is
  * why PlanOps.multiRankStage caps stages at 32 ranks, making the
  * practical per-task block n × 32 × 9 bytes (~10 MB even at a
  * 100×-entity cross-section). Pinned by the many-ranks ×
  * large-group spill test in MultiRankSpec. */
private final class MultiRankGroupIterator(
    input: Iterator[InternalRow],
    outputTypes: Array[DataType],
    keyOrds: Array[Int], keyTypes: Array[DataType],
    srcOrds: Array[Int], srcKinds: Array[Int],
    pct: Array[Boolean],
    memRows: Int, spillRows: Int, spillBytes: Long) extends Iterator[InternalRow] {

  private val numRanks = srcOrds.length
  private val join = new JoinedRow
  private val proj = UnsafeProjection.create(outputTypes)
  private val buffer = new SpillableRowBuffer(memRows, spillRows, spillBytes)
  private val rankRow = new GenericInternalRow(numRanks)
  // children normally emit UnsafeRow (a Sort or Window sits below);
  // convert defensively if a future child satisfies the required
  // ordering with a different row class
  private val toUnsafe = UnsafeProjection.create(outputTypes.dropRight(numRanks))
  private def unsafe(r: InternalRow): UnsafeRow = r match {
    case u: UnsafeRow => u
    case o => toUnsafe(o)
  }

  // head row of the NEXT group (copied: the stream row is reused)
  private var pendingHead: UnsafeRow = unsafe(input.next()).copy()
  private var groupSize = 0
  private var groupPos = 0
  private var groupRows: Iterator[UnsafeRow] = Iterator.empty
  private var rankVals: Array[Array[Double]] = _
  private var rankNull: Array[Array[Boolean]] = _

  override def hasNext: Boolean = groupPos < groupSize || pendingHead != null

  override def next(): InternalRow = {
    if (groupPos == groupSize) startNextGroup()
    val r = groupRows.next()
    var j = 0
    while (j < numRanks) {
      if (rankNull(j)(groupPos)) rankRow.setNullAt(j)
      else rankRow.update(j, rankVals(j)(groupPos))
      j += 1
    }
    groupPos += 1
    proj(join(r, rankRow))
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

  private def readDouble(r: InternalRow, ord: Int): Double = outputTypes(ord) match {
    case DoubleType => r.getDouble(ord)
    case FloatType => r.getFloat(ord).toDouble // exact, order-preserving
    case _ => throw new IllegalStateException("kind mismatch")
  }

  private def readLong(r: InternalRow, ord: Int): Long = outputTypes(ord) match {
    case LongType => r.getLong(ord)
    case IntegerType => r.getInt(ord).toLong
    case ShortType => r.getShort(ord).toLong
    case ByteType => r.getByte(ord).toLong
    case _ => throw new IllegalStateException("kind mismatch")
  }

  private def startNextGroup(): Unit = {
    buffer.clear()
    val head = pendingHead
    pendingHead = null
    buffer.add(head)
    var break = false
    while (!break && input.hasNext) {
      val r = unsafe(input.next())
      if (sameKeys(head, r)) buffer.add(r) // add() copies
      else { pendingHead = r.copy(); break = true }
    }
    val n = buffer.length
    // gather CHILD-sourced double inputs DIRECTLY into the output
    // arrays and rank IN PLACE: the tie-scan only reads values at
    // sorted positions >= the current run while rank writes go to
    // sorted positions < it (ord is a permutation), so the overwrite
    // never races a read. This halves the per-group heap bound to
    // the irreducible part — the rank-value block the node must hold
    // to emit rows row-major (numRanks × n doubles + the null flags);
    // only integral inputs need a separate gather (their long order
    // is not representable in the double output slot).
    val lvals: Array[Array[Long]] =
      srcKinds.zipWithIndex.map { case (k, j) =>
        if (k == 1 && srcOrds(j) >= 0) new Array[Long](n) else null
      }
    val nulls = Array.ofDim[Boolean](numRanks, n)
    rankVals = Array.ofDim[Double](numRanks, n)
    rankNull = nulls
    var i = 0
    val gather = buffer.iterator
    while (gather.hasNext) {
      val r = gather.next()
      var j = 0
      while (j < numRanks) {
        val ord = srcOrds(j)
        if (ord >= 0) {
          if (r.isNullAt(ord)) nulls(j)(i) = true
          else if (srcKinds(j) == 1) lvals(j)(i) = readLong(r, ord)
          else rankVals(j)(i) = readDouble(r, ord)
        }
        j += 1
      }
      i += 1
    }
    // compute ranks in declaration order (later ranks may read earlier
    // ranks' outputs — rank-of-rank chains in one pass)
    val ord = new Array[Integer](n)
    var j = 0
    while (j < numRanks) {
      val src = srcOrds(j)
      val dv: Array[Double] =
        if (src >= 0) rankVals(j) // in-place: input slot IS the output slot
        else { // earlier rank's output: its nulls become this rank's nulls
          val prev = ~src
          var t = 0
          while (t < n) { nulls(j)(t) = rankNull(prev)(t); t += 1 }
          rankVals(prev)
        }
      val lv = if (src >= 0) lvals(j) else null
      var m = 0
      var t = 0
      while (t < n) { if (!nulls(j)(t)) { ord(m) = t; m += 1 }; t += 1 }
      val cmp: java.util.Comparator[Integer] =
        if (srcKinds(j) == 1) (x: Integer, y: Integer) =>
          java.lang.Long.compare(lv(x), lv(y))
        else (x: Integer, y: Integer) =>
          SQLOrderingUtil.compareDoubles(dv(x), dv(y))
      java.util.Arrays.sort(ord, 0, m, cmp)
      val out = rankVals(j)
      var lo = 0
      while (lo < m) {
        var hi = lo + 1
        while (hi < m && cmp.compare(ord(hi), ord(lo)) == 0) hi += 1
        // EXACT window arithmetic: rank + (peers - 1) / 2.0, divided
        // by the non-null count only in pct mode
        val avg = (lo + 1).toDouble + (hi - lo - 1).toDouble / 2.0
        val v = if (pct(j)) avg / m.toDouble else avg
        var t2 = lo
        while (t2 < hi) { out(ord(t2)) = v; t2 += 1 }
        lo = hi
      }
      j += 1
    }
    groupSize = n
    groupPos = 0
    groupRows = buffer.iterator
  }
}
