package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Cross-sectional (per-date, across-entities) operator kernel.
  *
  * Re-expresses the reference's cross-sectional operators
  * (`database/functions/alpha101_engine.py:90-112` and the
  * industry-neutralization `neut` at `Project report.md:749-757`; see
  * SURVEY.md §2.5). The cross-sectional axis is a partition-only
  * window: `Window.partitionBy("trade_date")` — one shuffle per
  * TS→XS alternation, which is exactly the reference's pipeline stage
  * boundary (SURVEY.md §3.2).
  */
object XsOps {

  /** Tie count via RANGE CURRENT ROW peers: shares the SAME ordered
    * window spec (one exchange + one sort) as the rank() itself —
    * a `partitionBy(part :+ x)` count would add a whole extra hash
    * exchange per ranked expression (45 ranks = 45 shuffles in the
    * alpha pipeline before this). */
  private def peers(ordered: WindowSpec): Column =
    count(lit(1)).over(ordered.rangeBetween(Window.currentRow, Window.currentRow))

  /** Percentile rank in (0, 1] with pandas `rank(pct=True)` tie
    * semantics (average rank of ties / group size), matching
    * alpha101_engine.py:90-93: `rankPctBy(col("v"), col("trade_date"))`. */
  def rankPctBy(x: Column, partCols: Column*): Column = {
    val ordered = Window.partitionBy(partCols: _*).orderBy(x)
    val r = rank().over(ordered)
    val n = count(lit(1)).over(Window.partitionBy(partCols: _*))
    (r + (peers(ordered) - lit(1)) / lit(2.0)) / n
  }

  /** Null-safe percentile rank with pandas `rank(pct=True)` NaN
    * semantics: null inputs rank as null and are excluded from the
    * denominator (alpha101_engine.py:90-93 over warm-up series).
    * Nulls are ordered LAST so non-null ranks start at 1 — mirror
    * with DuckDB's default NULLS LAST. */
  def rankPct(x: Column, partCols: Column*): Column = {
    val part = Window.partitionBy(partCols: _*)
    val ordered = part.orderBy(x.asc_nulls_last)
    val r = rank().over(ordered)
    when(x.isNotNull, (r + (peers(ordered) - lit(1)) / lit(2.0)) / count(x).over(part))
  }

  /** scale(x, a): rescale so Σ|x| = a within the partition
    * (alpha101_engine.py:95-98). */
  def scale(x: Column, a: Double, partCols: Column*): Column =
    x * lit(a) / sum(abs(x)).over(Window.partitionBy(partCols: _*))

  /** z-score within the partition: (x - mean) / stddev. */
  def zscore(x: Column, partCols: Column*): Column = {
    val w = Window.partitionBy(partCols: _*)
    (x - avg(x).over(w)) / stddev_samp(x).over(w)
  }

  /** indneutralize(x, grp): subtract the per-(date, group) mean
    * (`Project report.md:749-757`). Pass all grouping columns, e.g.
    * `demean(col("alpha"), col("trade_date"), col("industry"))`. */
  def demean(x: Column, partCols: Column*): Column =
    x - avg(x).over(Window.partitionBy(partCols: _*))

  /** signedpower(x, a) = sign(x)·|x|^a (alpha101_engine.py:104-107). */
  def signedPower(x: Column, a: Double): Column =
    signum(x) * pow(abs(x), lit(a))

  /** Vectorized ternary (alpha101_engine.py:109-112). */
  def ifElse(c: Column, x: Column, y: Column): Column = when(c, x).otherwise(y)

  /** Equal-count decile (1..k) with a deterministic tie-break order.
    * ntile ≈ pandas qcut (SURVEY.md §2.4 A9; convention divergence
    * documented there). */
  def ntileBucket(k: Int, order: WindowSpec): Column = ntile(k).over(order)

  /** ANSI percent_rank (deterministic under ties in both Spark and
    * DuckDB): (min_rank - 1) / (n - 1). */
  def percentRank(x: Column, partCols: Column*): Column =
    percent_rank().over(Window.partitionBy(partCols: _*).orderBy(x))

  /** Spearman rank pre-transform: average-tie rank as a double, the
    * input to a Pearson corr for Rank-IC (SURVEY.md §2.4 A11-A12). */
  def avgRank(x: Column, partCols: Column*): Column = {
    val ordered = Window.partitionBy(partCols: _*).orderBy(x)
    val r = rank().over(ordered)
    (r + (peers(ordered) - lit(1)) / lit(2.0)).cast(DoubleType)
  }
}
