package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, StructField, StructType}

/** Rolling-moment window aggregate: the r15 fold-form skew/kurt/
  * stddev kernels ([[graft.ops.TsOps.withSkewKurt]] /
  * `tsStddevCf`) as ONE buffered aggregate instead of `collect_list`
  * arrays plus four O(d) lambda folds per output column.
  *
  * The r15 latent-divergence hunt (commit b31c1d6) established that
  * only a SEQUENTIAL two-pass association replays bitwise on both
  * engines for inexact inputs — the built-in skewness/kurtosis/
  * stddev_samp update their moments incrementally per row, an
  * accumulation a list-fold oracle cannot reproduce. The staged
  * `collect_list` forms bought that exactness at the cost of
  * materializing a boxed array column per window row and folding it
  * once per moment (r15 verdict, What's-wrong #3: pure
  * memory-bandwidth waste at 100×). This aggregate buffers the frame
  * ONCE as primitive doubles and evaluates every moment in
  * [[MomentsFold.evalMoments]] with the EXACT arithmetic association
  * of the staged fold — `mu = (((0+x1)+x2)+…)/n`, then
  * `c_k = Σ (x−mu)^k` accumulated left-to-right with left-associated
  * powers — so q40/q42/q44/q45 hashes are unchanged by construction
  * (pinned value-for-value against the fold forms in MomentsFoldSpec).
  *
  * Output struct:
  *  - `skew`  — population g1 = √n·c3/√(c2³); NULL for zero-variance
  *  - `kurt`  — population g2 = n·c4/c2² − 3; NULL for zero-variance
  *  - `stddev_fold` — sample √(c2/(n−1)) off the same staged c2
  *    (inexact-input form); NULL at n ≤ 1
  *  - `stddev_cf` — the closed-form power-sum stddev
  *    `√((N·Σx² − (Σx)²)/(N·(N−1)))` with N = ALL frame rows
  *    (`count(*)` semantics, nulls included — tsStddevCf's exact
  *    contract for exact-grain inputs, where the sequential power
  *    sums equal the window sums bit for bit because every partial is
  *    exact); NULL at N ≤ 1 or when the frame holds no non-null value
  *
  * Scale: WindowExec re-accumulates a sliding frame per row either
  * way (no retraction), so asymptotics are unchanged at O(d)/row —
  * what disappears is the per-row boxed `GenericArrayData`
  * materialization and the 4× re-fold of it. Update order is the
  * frame order (the same guarantee `collect_list` relies on); merge
  * concatenates in argument order and only exists for completeness —
  * the window path never calls it.
  */
case class MomentsFold(
    child: Expression,
    needCentral: Boolean = true,
    needCf: Boolean = true,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MomentsFold.Buf]
  with UnaryLike[Expression] with ImplicitCastInputTypes {

  require(needCentral || needCf, "moments_fold: at least one output family")

  override def inputTypes = Seq(DoubleType)

  override def createAggregationBuffer(): MomentsFold.Buf = new MomentsFold.Buf

  override def update(buf: MomentsFold.Buf, input: InternalRow): MomentsFold.Buf = {
    val v = child.eval(input)
    buf.nTotal += 1
    if (v != null) buf.append(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: MomentsFold.Buf, other: MomentsFold.Buf): MomentsFold.Buf = {
    buf.nTotal += other.nTotal
    var i = 0
    while (i < other.len) { buf.append(other.vs(i)); i += 1 }
    buf
  }

  override def eval(buf: MomentsFold.Buf): Any =
    MomentsFold.evalMoments(buf, needCentral, needCf)

  override def serialize(buf: MomentsFold.Buf): Array[Byte] = {
    // loud failure instead of a wrapped-negative allocate: a grouping
    // aggregate over ~2.7e8+ buffered values is past the point this
    // buffer-everything kernel makes sense anyway (the window path —
    // the intended use — never serializes)
    require(buf.len <= (Int.MaxValue - 12) / 8,
      s"moments_fold: buffer of ${buf.len} doubles exceeds the serializable bound")
    val bb = ByteBuffer.allocate(8 + 4 + 8 * buf.len)
    bb.putLong(buf.nTotal)
    bb.putInt(buf.len)
    var i = 0
    while (i < buf.len) { bb.putDouble(buf.vs(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MomentsFold.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new MomentsFold.Buf
    buf.nTotal = bb.getLong
    val n = bb.getInt
    var i = 0
    while (i < n) { buf.append(bb.getDouble); i += 1 }
    buf
  }

  override def dataType: DataType = MomentsFold.outputType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): MomentsFold =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MomentsFold =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MomentsFold =
    copy(child = newChild)

  override def prettyName: String = "moments_fold"
}

object MomentsFold {

  val outputType: StructType = StructType(Seq(
    StructField("skew", DoubleType, nullable = true),
    StructField("kurt", DoubleType, nullable = true),
    StructField("stddev_fold", DoubleType, nullable = true),
    StructField("stddev_cf", DoubleType, nullable = true)))

  /** Growable primitive-double frame buffer: `nTotal` counts every
    * update row (the `count(*)` axis), `vs[0..len)` holds the
    * non-null values in frame order (the `collect_list` axis). */
  final class Buf {
    var nTotal: Long = 0L
    var vs: Array[Double] = new Array[Double](16)
    var len: Int = 0
    def append(v: Double): Unit = {
      if (len == vs.length) vs = java.util.Arrays.copyOf(vs, len * 2)
      vs(len) = v
      len += 1
    }
  }

  /** The staged fold's arithmetic, association for association (see
    * class doc). Kept on the companion so MomentsFoldSpec can drive
    * it directly against the Column fold forms. The need* flags skip
    * whole per-element passes a caller never reads — tsStddevCf
    * consumers (hot per-row-per-frame loops in the factor plane)
    * don't pay the central-moment pass, withSkewKurt consumers don't
    * pay the power-sum pass (r16 review finding). */
  def evalMoments(buf: Buf, needCentral: Boolean, needCf: Boolean): InternalRow = {
    val out = new GenericInternalRow(4)
    out.setNullAt(0); out.setNullAt(1); out.setNullAt(2); out.setNullAt(3)
    val n = buf.len
    val vs = buf.vs
    if (n > 0) {
      // pass 1 (both families): Σx as the left fold
      // `aggregate(arr, 0.0, (a,v) => a+v)`
      var sx = 0.0
      var i = 0
      while (i < n) { sx += vs(i); i += 1 }
      val nd = n.toDouble
      if (needCentral) {
        val mu = sx / nd
        // pass 2: central sums, each power left-associated exactly as
        // the staged `(v-mu)*(v-mu)*…` Catalyst tree multiplies
        var c2 = 0.0; var c3 = 0.0; var c4 = 0.0
        i = 0
        while (i < n) {
          val d = vs(i) - mu
          val d2 = d * d      // (v-mu)*(v-mu)
          val d3 = d2 * d     // ((v-mu)*(v-mu))*(v-mu)
          c2 += d2
          c3 += d3
          c4 += d3 * d        // (((v-mu)*(v-mu))*(v-mu))*(v-mu)
          i += 1
        }
        if (c2 != 0.0) {
          out.setDouble(0, math.sqrt(nd) * c3 / math.sqrt(c2 * c2 * c2))
          out.setDouble(1, nd * c4 / (c2 * c2) - 3.0)
        }
        if (n > 1) out.setDouble(2, math.sqrt(c2 / (nd - 1.0)))
      }
      // closed-form power sums over the same sequential order; exact
      // for exact-grain inputs, so == the window-sum replay bitwise
      if (needCf && buf.nTotal > 1) {
        val nt = buf.nTotal.toDouble
        var sxx = 0.0
        i = 0
        while (i < n) { sxx += vs(i) * vs(i); i += 1 }
        val vx = nt * sxx - sx * sx
        out.setDouble(3, math.sqrt(vx / (nt * (nt - 1.0))))
      }
    }
    out
  }
}
