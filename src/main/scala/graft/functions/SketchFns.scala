package graft.functions

import graft.expressions.KmvMinK
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit, when}
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

  /** 2^60 — the [[graft.functions.DedupFns.portableHash60]] range,
    * exactly representable as a double. */
  val KmvTwo60: Double = 1.152921504606846976e18

  /** The KMV estimator over a sketch's (n_mins, kth_min) columns —
    * the ONE definition every entry and its oracle mirror: fewer
    * retained values than k means the sketch is exhaustive (the
    * count IS the cardinality); otherwise the fixed-order double
    * chain `(k−1)/kth_min · 2^60` (divide BEFORE multiplying so
    * intermediates stay bounded and both engines run the identical
    * IEEE sequence — mirror it in SQL as
    * `CASE WHEN n < k THEN n ELSE CAST(floor(CAST(k−1 AS DOUBLE) /
    * kth * CAST(1152921504606846976 AS DOUBLE) + 0.5) AS BIGINT)
    * END`). The long cast stays under ANSI's 2^63 below ~2^55
    * distinct keys. `k` is a Column so callers with per-row sketch
    * sizes (q140 emits two) share the same definition. */
  def kmvEstimate(nMins: Column, kthMin: Column, k: Column): Column =
    when(nMins < k, nMins)
      .otherwise(floor((k - lit(1)).cast("double") / kthMin
        * lit(KmvTwo60) + lit(0.5)).cast("long"))
}
