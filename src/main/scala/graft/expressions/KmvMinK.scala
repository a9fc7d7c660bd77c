package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV (K-minimum-values / bottom-k) distinct-count sketch buffer:
  * the k smallest DISTINCT values of a non-negative long hash
  * column, as a sorted-ascending `array<bigint>`.
  *
  * This is the fixed-memory cardinality sketch: each partition's
  * partial buffer holds at most k longs (duplicates collapse on
  * insert via the TreeSet), merge is a bounded union-and-trim, and
  * the final exchange moves k·numPartitions longs regardless of
  * input size — no shuffle of the distinct key set, which is the
  * whole point at 10^10+ distinct keys. The estimator
  * `(k-1) / (kth_min / 2^60)` and its set algebra (union = k
  * smallest of the concatenation; Jaccard ≈ shared fraction of the
  * union sketch) live in the callers, composed from exact integer
  * outputs so a SQL oracle replays them bit for bit — unlike
  * library HLL/theta sketches, whose register hashing is opaque.
  *
  * Buffer: `java.util.TreeSet[java.lang.Long]` — k ≤ a few thousand
  * in practice, so the boxed tree's O(log k) insert is noise next
  * to the per-row hash. Values must be ≥ 0 (the callers feed
  * md5-60-bit hashes); ties/dups are deduped, nulls ignored.
  */
case class KmvMinK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] with ImplicitCastInputTypes {

  require(k > 0, "kmv_min_k requires k > 0")

  // analysis-time input contract (load-bearing since the SQL surface,
  // graft_kmv_min_k, exposes this to arbitrary arguments): integers
  // widen to long implicitly; a double/binary argument is an ANALYSIS
  // error instead of an executor-side ClassCastException in update().
  // Result type inferred — AbstractDataType is private[sql] and
  // cannot be named here.
  override def inputTypes = Seq(LongType)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last) { if (buf.add(v)) { buf.pollLast(); () } }
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMinK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMinK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvMinK =
    copy(child = newChild)

  override def prettyName: String = "kmv_min_k"
}
