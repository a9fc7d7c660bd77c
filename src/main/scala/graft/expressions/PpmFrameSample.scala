package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, IntegerType, StructField, StructType}

/** Every-Nth FRAME SAMPLING over a multi-frame media payload — the
  * 4th multimodal brief verb (decode / feature-extract / resize /
  * frame-sample), as the tier's first explode-shaped operator: a
  * Catalyst [[Generator]], so one video-ish payload row becomes
  * 0..k sampled-frame rows inside a `Generate` node — never a
  * `SerializeFromObject` object boundary, never a UDF.
  *
  * Wire format: a concatenation of complete P6 images (the
  * uncompressed multi-frame container the zero-codec environment
  * supports — a real deployment swaps the walker for a container
  * demuxer, the Generate-shaped plumbing is identical). The walker
  * re-uses [[PpmResize.parseP6Header]] — the SAME parser the resize
  * expression runs, comments and all — to find each frame boundary,
  * and emits `(frame_idx, n_frames, frame)` for frames
  * `0, every, 2·every, …`. The emitted frame is the exact original
  * byte slice (header included), so sampled frames COMPOSE with
  * [[PpmResize]] and re-walk as 1-frame payloads.
  *
  * Untrusted-media contract, generator edition: a malformed payload
  * (bad magic anywhere in the chain, truncated frame, trailing
  * garbage after the last complete frame) yields ZERO rows — the
  * whole payload is rejected, because a partially-parsed video is
  * evidence of corruption, not data. Unsampled frames are never
  * materialized (the walker skips over their bytes) — at 100 TB the
  * sampler's output is `1/every` of the corpus, and the discarded
  * frames cost header parses, not copies.
  */
case class PpmFrameSample(child: Expression, every: Int)
    extends UnaryExpression with Generator with CodegenFallback
    with ImplicitCastInputTypes {

  require(every > 0, "PpmFrameSample: sampling stride must be positive")

  // analysis-time input contract: a non-binary payload column is an
  // ANALYSIS error, not an executor-side ClassCastException
  override def inputTypes = Seq(BinaryType)

  override def elementSchema: StructType = StructType(Seq(
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("frame", BinaryType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Nil
    val b = v.asInstanceOf[Array[Byte]]
    val n = b.length
    if (n == 0) return Nil
    // pass 1: walk every frame boundary; reject the WHOLE payload on
    // any malformed or trailing content (strict contract, class doc)
    val bounds = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var p = 0
    while (p < n) {
      val hd = PpmResize.parseP6Header(b, p)
      if (hd == null) return Nil
      // parseP6Header guarantees w·h·3 fits the remaining bytes
      val end = hd(2) + hd(0) * hd(1) * 3
      bounds += ((p, end))
      p = end
    }
    val nf = bounds.length
    // pass 2: emit only the sampled frames, as exact byte slices
    bounds.iterator.zipWithIndex.collect {
      case ((start, end), idx) if idx % every == 0 =>
        val row = new GenericInternalRow(3)
        row.setInt(0, idx)
        row.setInt(1, nf)
        row.update(2, java.util.Arrays.copyOfRange(b, start, end))
        (row: InternalRow)
    }.toSeq
  }

  override protected def withNewChildInternal(newChild: Expression): PpmFrameSample =
    copy(child = newChild)

  override def prettyName: String = "ppm_frame_sample"
}
