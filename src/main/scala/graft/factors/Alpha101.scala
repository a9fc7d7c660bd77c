package graft.factors

import graft.ops.XsOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** First tranche of the WorldQuant Alpha101 corpus
  * (`database/functions/alpha101_function.md:5-105`, engine kernels
  * `database/functions/alpha101_engine.py:17-112`): 15 formulas
  * covering every operator class — cross-sectional rank, rolling
  * correlation, ts_rank/ts_argmax, signed power, conditional logic,
  * and the indneutralize user alpha_048.
  *
  * The pipeline alternates TS stages (windows over `stock`) and XS
  * stages (windows over `day`), the reference's "alternating axis"
  * shape (`Project report.md:739-781`): each axis flip is one
  * shuffle, and every factor inside a stage shares that stage's
  * exchange.
  *
  * Pinned conventions (mirrored in the q46/q47 oracles):
  *  - no min_periods anywhere: rolling values start from row 1
  *    (TsOps convention), so warm-up rows differ from pandas'
  *    NaN-until-full-window;
  *  - rolling correlation pairs are masked to rows where BOTH inputs
  *    are non-null (closed-form sums, den > 0 guard);
  *  - `rank` = pandas pct rank, average ties, nulls excluded from
  *    numerator and denominator ([[XsOps.rankPct]]);
  *  - `ts_rank` = scipy `rankdata(arr)[-1]` (average ties, RAW
  *    1..n rank, not a percentile) matching alpha101_engine.py:60-64;
  *  - `ts_argmax` = np.argmax: 0-based index of the FIRST maximum
  *    counted from the window start (alpha101_engine.py:50-53), with
  *    null entries dropped from the window list;
  *  - `returns` = close / delay(close, 1) - 1.
  */
object Alpha101 {

  private val W = Window.partitionBy("stock").orderBy("day")
  private def t(d: Int) = W.rowsBetween(-(d - 1), 0)

  private def div(num: Column, den: Column): Column =
    when(den =!= 0.0, num / den)

  private def xr(x: Column): Column = XsOps.rankPct(x, col("day"))

  /** Rolling Pearson correlation, closed form over both-non-null
    * pairs (alpha101_engine.py:28-31). */
  private def tsCorrCf(x: Column, y: Column, d: Int): Column = {
    val both = x.isNotNull && y.isNotNull
    val f = t(d)
    val n = sum(when(both, 1.0).otherwise(0.0)).over(f)
    val sx = sum(when(both, x)).over(f)
    val sy = sum(when(both, y)).over(f)
    val sxx = sum(when(both, x * x)).over(f)
    val syy = sum(when(both, y * y)).over(f)
    val sxy = sum(when(both, x * y)).over(f)
    val num = n * sxy - sx * sy
    val vx = n * sxx - sx * sx
    val vy = n * syy - sy * sy
    // threshold instead of > 0: fp cancellation can make a true-zero
    // variance slightly negative (and differently so per engine);
    // legitimate variances on this panel are >= ~5e-5 (grain 1/300)
    when(vx > 1e-9 && vy > 1e-9, num / (sqrt(vx) * sqrt(vy)))
  }

  /** scipy rankdata(arr)[-1]: average-tie rank of the current value
    * within its trailing window, raw 1..n. */
  private def tsRankAvg(x: Column, d: Int): Column = {
    val arr = collect_list(x).over(t(d))
    val lt = size(filter(arr, v => v < x)).cast(DoubleType)
    val eq = size(filter(arr, v => v === x)).cast(DoubleType)
    lt + (eq + lit(1.0)) / lit(2.0)
  }

  /** np.argmax over the trailing window: 0-based first-max index
    * from the window start (nulls dropped by collect_list). */
  private def tsArgMaxIdx(x: Column, d: Int): Column = {
    val arr = collect_list(x).over(t(d))
    (array_position(arr, array_max(arr)) - 1).cast(DoubleType)
  }

  def compute(quotes: DataFrame): DataFrame = {
    // ---- TS stage 0: lags, deltas, running sums ----
    val s0 = quotes
      .withColumn("ret", div(col("close"), lag(col("close"), 1).over(W)) - lit(1.0))
      .withColumn("dc1", col("close") - lag(col("close"), 1).over(W))
      .withColumn("dv1", (col("volume") - lag(col("volume"), 1).over(W)).cast(DoubleType))
      .withColumn("ophl", col("open") - lag(col("high"), 1).over(W))
      .withColumn("opcl", col("open") - lag(col("close"), 1).over(W))
      .withColumn("opll", col("open") - lag(col("low"), 1).over(W))
      .withColumn("co", div(col("close"), col("open")))
      .withColumn("kline", div((col("close") - col("low")) - (col("high") - col("close")),
        col("close") - col("low")))
    val s1 = s0
      .withColumn("dc1l", lag(col("dc1"), 1).over(W))
      .withColumn("a8base", sum(col("open")).over(t(5)) * sum(col("ret")).over(t(5)))
      .withColumn("std20", stddev_samp(col("ret")).over(t(20)))
      .withColumn("a53", -(col("kline") - lag(col("kline"), 9).over(W)))
      .withColumn("s48", sum(col("ret") * col("ret")).over(t(250)))
    // ---- XS stage: input ranks; TS follow-ups on materialized cols
    val s2 = s1
      .withColumn("a8diff", col("a8base") - lag(col("a8base"), 10).over(W))
      .withColumn("a1sig", XsOps.signedPower(
        when(col("ret") < 0, col("std20")).otherwise(col("close")), 2.0))
      .withColumn("r_open", xr(col("open")))
      .withColumn("r_vol", xr(col("volume")))
      .withColumn("r_low", xr(col("low")))
    // ---- TS stage: correlations, ts_ranks, argmax ----
    val s3 = s2
      .withColumn("a1arg", tsArgMaxIdx(col("a1sig"), 5))
      .withColumn("corr3", tsCorrCf(col("r_open"), col("r_vol"), 10))
      .withColumn("corr6", tsCorrCf(col("open"), col("volume").cast(DoubleType), 10))
      .withColumn("tsr_low9", tsRankAvg(col("r_low"), 9))
      .withColumn("tsr_close10", tsRankAvg(col("close"), 10))
      .withColumn("corr48", tsCorrCf(col("dc1"), col("dc1l"), 250))
      .withColumn("a48num", div(col("corr48") * col("dc1"), col("close")))
    // ---- XS stage: final ranks + industry neutralization ----
    s3
      .withColumn("alpha_001", xr(col("a1arg")) - lit(0.5))
      .withColumn("alpha_003", -col("corr3"))
      .withColumn("alpha_004", -col("tsr_low9"))
      .withColumn("alpha_006", -col("corr6"))
      .withColumn("alpha_008", -xr(col("a8diff")))
      .withColumn("alpha_012", signum(col("dv1")) * -col("dc1"))
      .withColumn("alpha_020", -xr(col("ophl")) * xr(col("opcl")) * xr(col("opll")))
      .withColumn("alpha_033", xr(-(lit(1.0) - div(col("open"), col("close")))))
      .withColumn("alpha_038", -xr(col("tsr_close10")) * xr(col("co")))
      .withColumn("alpha_041", pow(col("high") * col("low"), 0.5) - col("vwap"))
      .withColumn("alpha_042", div(xr(col("vwap") - col("close")), xr(col("vwap") + col("close"))))
      .withColumn("alpha_048",
        div(XsOps.demean(col("a48num"), col("day"), col("industry")), col("s48")))
      .withColumn("alpha_053", col("a53"))
      .withColumn("alpha_054", div(-(col("low") - col("close")) * pow(col("open"), 5.0),
        (col("low") - col("high")) * pow(col("close"), 5.0)))
      .withColumn("alpha_101",
        (col("close") - col("open")) / (col("high") - col("low") + lit(0.001)))
  }

  /** Implemented alpha columns, batch 1 / batch 2 (q46 / q47). */
  val batch1: Seq[String] = Seq(
    "alpha_001", "alpha_003", "alpha_004", "alpha_006", "alpha_008",
    "alpha_012", "alpha_020")
  val batch2: Seq[String] = Seq(
    "alpha_033", "alpha_038", "alpha_041", "alpha_042", "alpha_048",
    "alpha_053", "alpha_054", "alpha_101")
  val columns: Seq[String] = batch1 ++ batch2
}
