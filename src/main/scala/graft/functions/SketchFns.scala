package graft.functions

import graft.expressions.KmvMinK
import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Cardinality-sketch column functions. Companion to the count-min
  * frequency sketch in `CorpusQueries.cmsFrequency` (q132): where
  * CMS answers "how often", KMV answers "how many distinct" — the
  * two sketches a 100 TB profiling pass carries through every
  * partition. Deterministic by construction (exact integer hash
  * minima, no register rounding), so SQL oracles replay the sketch
  * value for value.
  */
object SketchFns {

  /** Bottom-k sketch: the k smallest distinct values of a
    * non-negative long hash column, sorted ascending
    * ([[graft.expressions.KmvMinK]]). Partial buffers are ≤ k longs
    * per task and merge by union-and-trim, so distinct-cardinality
    * estimation costs one map-side-combined aggregate with a
    * k·numPartitions-long final merge — never a shuffle of the
    * distinct key set. Estimate (callers): `n_mins < k` → the sketch
    * is exhaustive and exact; else `(k-1) / kth_min · 2^60` for
    * 60-bit hashes (relative error ≈ 1/√(k−2)). */
  def kmvMinK(hash: Column, k: Int): Column =
    ColumnBridge.column(
      KmvMinK(ColumnBridge.expression(hash), k).toAggregateExpression())
}
