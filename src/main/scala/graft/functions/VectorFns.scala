package graft.functions

import graft.expressions.{DoubleVecDot, LongVecFold}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Dense-vector column functions over `array<float|double>` embedding
  * columns. The dot-product kernel is a native codegen'd Catalyst
  * expression ([[graft.expressions.DoubleVecDot]]); everything else
  * is pure Column expressions — no UDFs, so the operators distribute
  * trivially.
  */
object VectorFns {

  /** Cast an array<float> column to array<double> for stable math. */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Codegen'd Σ aᵢ·bᵢ — same ascending-index association as the
    * interpreted HOF it replaced, so oracle hashes are unchanged. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DoubleVecDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null if either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b); val na = norm(a); val nb = norm(b)
    when(na > 0 && nb > 0, d / (na * nb))
  }

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v))

  /** Weighted Euclidean distance over fixed feature columns — the
    * reference's "History Mirror" similarity kernel
    * (`app/Quantlib/QuantDB.py:190-202`): sqrt(Σ (wᵢ·(xᵢ−tᵢ))²),
    * weights INSIDE the square exactly as the reference writes
    * `pow((bias_diff) * 5, 2)`. */
  def weightedEuclidean(features: Seq[(Column, Double, Double)]): Column =
    weightedEuclideanCols(features.map { case (c, t, w) => (c, lit(t), w) })

  /** Same kernel with data-driven targets (the target vector joined
    * in from the factor table rather than literal). */
  def weightedEuclideanCols(features: Seq[(Column, Column, Double)]): Column =
    sqrt(features.map { case (c, target, wt) =>
      pow((c - target) * lit(wt), 2)
    }.reduce(_ + _))

  /** Random-hyperplane signature bit: sign of dot(v, plane) packed by
    * the caller. Planes are generated deterministically from a seed
    * via a splitmix64-style hash so executors need no broadcast state. */
  private def splitmix(seed: Long, i: Int, j: Int): Double = {
    var z = seed + 0x9e3779b97f4a7c15L * (i.toLong * 131071L + j + 1L)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    // map to (-1, 1)
    (z.toDouble / Long.MaxValue.toDouble)
  }

  /** The deterministic plane constants, for embedding the SAME
    * hyperplanes into an external oracle's SQL. */
  def planes(dim: Int, nBits: Int, seed: Long): Seq[Seq[Double]] =
    (0 until nBits).map(b => (0 until dim).map(j => splitmix(seed, b, j)))

  /** Per-vector symmetric int8 quantization: scale = 127 / max|x|,
    * component → floor(x·scale + 0.5) as long (range −127..127; the
    * +0.5 floor is one deterministic rounding rule both engines
    * share, unlike round()'s half-even). All-zero, all-null-ish and
    * non-finite-max vectors quantize to zeros (the `mx > 0` guard is
    * false for NaN). Because the scale normalizes by max|x|, the
    * quantized vector — and therefore any integer dot-product
    * ranking over it — is INVARIANT under positive scaling of the
    * input (pinned in VectorFnsSpec). */
  def int8Quantize(v: Column): Column = {
    val mx = array_max(transform(v, x => abs(x)))
    val scale = lit(127.0) / mx
    when(mx > 0, transform(v, x => floor(x * scale + lit(0.5)).cast("long")))
      .otherwise(transform(v, _ => lit(0L)))
  }

  /** Exact integer dot product of two quantized vectors (the q121
    * ranking key, q138's cosine operands — no floating point in the
    * compare path). Codegen'd ([[graft.expressions.LongVecFold]]);
    * integer addition commutes exactly and null elements / unequal
    * lengths null the result like `aggregate(zip_with(...))` does,
    * so values are unchanged from the interpreted HOF form. */
  def longDot(a: Column, b: Column): Column =
    ColumnBridge.column(LongVecFold(
      ColumnBridge.expression(a), ColumnBridge.expression(b), squaredDiff = false))

  /** Exact integer Σ (aᵢ−bᵢ)² — the q137 k-means assignment kernel. */
  def longSqDist(a: Column, b: Column): Column =
    ColumnBridge.column(LongVecFold(
      ColumnBridge.expression(a), ColumnBridge.expression(b), squaredDiff = true))

  def int8Dot(a: Column, b: Column): Column = longDot(a, b)

  /** SimHash-style LSH bucket id for a dense vector: `nBits` random
    * hyperplane signs packed into a long. Deterministic across runs.
    * dim must cover the vector length. */
  def hyperplaneBucket(v: Column, dim: Int, nBits: Int, seed: Long): Column = {
    val bits = (0 until nBits).map { b =>
      val plane = (0 until dim).map(j => splitmix(seed, b, j))
      val proj = dot(v, array(plane.map(lit): _*))
      when(proj >= 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce(_ bitwiseOR _)
  }
}
