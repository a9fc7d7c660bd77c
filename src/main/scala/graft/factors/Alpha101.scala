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
    * within its trailing window, raw 1..n; null for a null input
    * (collect_list drops nulls, so the window holds the non-null
    * history). */
  private def tsRankAvg(x: Column, d: Int): Column = {
    val arr = collect_list(x).over(t(d))
    val lt = size(filter(arr, v => v < x)).cast(DoubleType)
    val eq = size(filter(arr, v => v === x)).cast(DoubleType)
    when(x.isNotNull, lt + (eq + lit(1.0)) / lit(2.0))
  }

  /** np.argmax over the trailing window: 0-based first-max index
    * from the window start (nulls dropped by collect_list). */
  private def tsArgMaxIdx(x: Column, d: Int): Column = {
    val arr = collect_list(x).over(t(d))
    (array_position(arr, array_max(arr)) - 1).cast(DoubleType)
  }

  /** Rolling sample covariance, closed form over both-non-null pairs
    * (alpha101_engine.py:33-36). */
  private def tsCovCf(x: Column, y: Column, d: Int): Column = {
    val both = x.isNotNull && y.isNotNull
    val f = t(d)
    val n = sum(when(both, 1.0).otherwise(0.0)).over(f)
    val sx = sum(when(both, x)).over(f)
    val sy = sum(when(both, y)).over(f)
    val sxy = sum(when(both, x * y)).over(f)
    when(n > 1, (sxy - sx * sy / n) / (n - lit(1.0)))
  }

  /** Rolling sample stddev in closed form — used where the stddev
    * VALUE feeds a cross-sectional rank: both engines then build the
    * identical double from exact sums, avoiding Welford-vs-segment-
    * tree ulp divergence (which breaks rank ties differently). */
  private def tsStdCf(x: Column, d: Int): Column = {
    val f = t(d)
    val n = count(lit(1)).over(f).cast(DoubleType)
    val vx = n * sum(x * x).over(f) - sum(x).over(f) * sum(x).over(f)
    when(n > 1, sqrt(vx / (n * (n - lit(1.0)))))
  }

  /** EXACT rank surrogate for rolling stddev: n·Σx² − (Σx)² is
    * integer-grain-exact for the panel's exact inputs and strictly
    * monotone with stddev at fixed n (n is uniform within a day), so
    * cross-sectional ranks of it equal ranks of the stddev — without
    * the engine-ulp tie-breaking hazard of ranking a Welford vs
    * segment-tree stddev (stocks s and s+64 tie EXACTLY here). Null
    * at n=1 to preserve stddev_samp's null. */
  private def varSurrogate(x: Column, d: Int): Column = {
    val f = t(d)
    val n = count(lit(1)).over(f).cast(DoubleType)
    when(n > 1, n * sum(x * x).over(f) - sum(x).over(f) * sum(x).over(f))
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
      .withColumn("oc", col("open") - col("close"))
      .withColumn("chl", (col("close") + col("high")) - col("low"))
      .withColumn("dc3", col("close") - lag(col("close"), 3).over(W))
      .withColumn("dc7", col("close") - lag(col("close"), 7).over(W))
      .withColumn("dh2", col("high") - lag(col("high"), 2).over(W))
      .withColumn("c_lag10", lag(col("close"), 10).over(W))
      .withColumn("c_lag20", lag(col("close"), 20).over(W))
      .withColumn("c_lag100", lag(col("close"), 100).over(W))
      .withColumn("vold", col("volume").cast(DoubleType))
      .withColumn("adv20", avg(col("amount")).over(t(20)))
      // volume ratio: exact surrogate for rank(delta(log(volume),2))
      // — IEEE division is correctly rounded, so equal true ratios
      // give equal doubles in every engine (log deltas would not)
      .withColumn("vr2", div(col("vold"), lag(col("vold"), 2).over(W)))
      .withColumn("coo", div(col("close") - col("open"), col("open")))
      .withColumn("vmc", col("vwap") - col("close"))
      .withColumn("cmv", col("close") - col("vwap"))
      .withColumn("dv3", (col("volume") - lag(col("volume"), 3).over(W)).cast(DoubleType))
      .withColumn("absco", abs(col("close") - col("open")))
      .withColumn("hc", col("high") - col("close"))
      .withColumn("hl2", (col("high") + col("low")) / 2.0)
      .withColumn("c5l", lag(col("close"), 5).over(W))
      .withColumn("ibsv", div((col("close") - col("low")) - (col("high") - col("close")),
        col("high") - col("low")) * col("vold"))
      .withColumn("var17", div(col("vold"), col("adv20")))
      .withColumn("adv180", avg(col("amount")).over(t(180)))
    val s1 = s0
      .withColumn("dc1l", lag(col("dc1"), 1).over(W))
      .withColumn("dc1l2", lag(col("dc1"), 2).over(W))
      .withColumn("ocl", lag(col("oc"), 1).over(W))
      .withColumn("a8base", sum(col("open")).over(t(5)) * sum(col("ret")).over(t(5)))
      .withColumn("std20", stddev_samp(col("ret")).over(t(20)))
      .withColumn("a53", -(col("kline") - lag(col("kline"), 9).over(W)))
      .withColumn("s48", sum(col("ret") * col("ret")).over(t(250)))
      // the delay(close,20/10) "ladder" of alphas 046/049/051
      .withColumn("ladder",
        (col("c_lag20") - col("c_lag10")) / 10.0 - (col("c_lag10") - col("close")) / 10.0)
      .withColumn("tsmin_dc1_5", min(col("dc1")).over(t(5)))
      .withColumn("tsmax_dc1_5", max(col("dc1")).over(t(5)))
      .withColumn("tsmin_dc1_4", min(col("dc1")).over(t(4)))
      .withColumn("tsmax_dc1_4", max(col("dc1")).over(t(4)))
      .withColumn("sr250", sum(col("ret")).over(t(250)))
      .withColumn("mh20", avg(col("high")).over(t(20)))
      .withColumn("m100", avg(col("close")).over(t(100)))
      .withColumn("stdc20", stddev_samp(col("close")).over(t(20)))
      .withColumn("sv5", sum(col("volume")).over(t(5)))
      .withColumn("sv20", sum(col("volume")).over(t(20)))
      .withColumn("stdr2", stddev_samp(col("ret")).over(t(2)))
      .withColumn("stdr5", stddev_samp(col("ret")).over(t(5)))
      .withColumn("stdh10", stddev_samp(col("high")).over(t(10)))
      .withColumn("tsminc100", min(col("close")).over(t(100)))
      .withColumn("tsminl12", min(col("low")).over(t(12)))
      .withColumn("tsmaxh12", max(col("high")).over(t(12)))
      .withColumn("corr_hv5", tsCorrCf(col("high"), col("vold"), 5))
      .withColumn("dret3", col("ret") - lag(col("ret"), 3).over(W))
      .withColumn("tsmax_vmc3", max(col("vmc")).over(t(3)))
      .withColumn("tsmin_vmc3", min(col("vmc")).over(t(3)))
      .withColumn("svw10", sum(col("vwap")).over(t(10)))
      .withColumn("sc5", sum(col("close")).over(t(5)))
      .withColumn("sc7", sum(col("close")).over(t(7)))
      .withColumn("sc20", sum(col("close")).over(t(20)))
      .withColumn("smdc520", sum(col("c5l")).over(t(20)))
      .withColumn("a52min", min(col("low")).over(t(5)))
      .withColumn("sr240", sum(col("ret")).over(t(240)))
      .withColumn("sr20r", sum(col("ret")).over(t(20)))
      .withColumn("std_absco5", tsStdCf(col("absco"), 5))
      .withColumn("corr_co10", tsCorrCf(col("close"), col("open"), 10))
      .withColumn("corr_c_v2", tsCorrCf(col("close"), col("vold"), 2))
      .withColumn("corr_v_vw230", tsCorrCf(col("vwap"), col("c5l"), 230))
      .withColumn("corr_adv_low5", tsCorrCf(col("adv20"), col("low"), 5))
      .withColumn("argmax_c30", tsArgMaxIdx(col("close"), 30))
      .withColumn("argmax_c10", tsArgMaxIdx(col("close"), 10))
      .withColumn("tsr_v5", tsRankAvg(col("vold"), 5))
      .withColumn("tsr_h5", tsRankAvg(col("high"), 5))
      .withColumn("tsr_var17_5", tsRankAvg(col("var17"), 5))
      .withColumn("mean_c8", avg(col("close")).over(t(8)))
      .withColumn("mean_c2", avg(col("close")).over(t(2)))
      .withColumn("std_c8cf", tsStdCf(col("close"), 8))
      .withColumn("tsmin_vw16", min(col("vwap")).over(t(16)))
      .withColumn("corr_vw_adv18", tsCorrCf(col("vwap"), col("adv180"), 18))
      .withColumn("dl_var17_9", graft.ops.TsOps.decayLinear(col("var17"), 9, W))
    // ---- XS stage: input ranks; TS follow-ups on materialized cols
    val s2 = s1
      .withColumn("a8diff", col("a8base") - lag(col("a8base"), 10).over(W))
      .withColumn("a1sig", XsOps.signedPower(
        when(col("ret") < 0, col("std20")).otherwise(col("close")), 2.0))
      .withColumn("r_open", xr(col("open")))
      .withColumn("r_vol", xr(col("volume")))
      .withColumn("r_low", xr(col("low")))
      .withColumn("aratio", div(col("amount"), col("adv20")))
      .withColumn("m100d", col("m100") - lag(col("m100"), 100).over(W))
      .withColumn("dcorr5", col("corr_hv5") - lag(col("corr_hv5"), 5).over(W))
      .withColumn("sgn3",
        signum(col("dc1")) + signum(col("dc1l")) + signum(col("dc1l2")))
      .withColumn("stoch12",
        div(col("close") - col("tsminl12"), col("tsmaxh12") - col("tsminl12")))
      .withColumn("a10base",
        when(col("tsmin_dc1_4") > 0, col("dc1"))
          .when(col("tsmax_dc1_4") < 0, col("dc1")).otherwise(-col("dc1")))
      .withColumn("r_vwap", xr(col("vwap")))
      .withColumn("r_stdc20", xr(varSurrogate(col("close"), 20)))
      .withColumn("r_stdh10", xr(varSurrogate(col("high"), 10)))
      .withColumn("ddc1", col("dc1") - col("dc1l"))
      .withColumn("a52minl", lag(col("a52min"), 5).over(W))
      .withColumn("corr_s5_s20", tsCorrCf(col("sc5"), col("sc20"), 2))
      .withColumn("corr_tsr5", tsCorrCf(col("tsr_v5"), col("tsr_h5"), 5))
      .withColumn("r_close", xr(col("close")))
      .withColumn("r_high", xr(col("high")))
      .withColumn("r_vr2", xr(col("vr2")))
      .withColumn("r_coo", xr(col("coo")))
      .withColumn("r_dc1", xr(col("dc1")))
      .withColumn("r_oc", xr(col("oc")))
      .withColumn("r_sr250", xr(round(lit(1.0) + col("sr250"), 6)))
      .withColumn("r_ratio34", xr(round(div(col("stdr2"), col("stdr5")), 6)))
    // ---- TS stage: correlations, ts_ranks, argmax ----
    val s3 = s2
      .withColumn("a1arg", tsArgMaxIdx(col("a1sig"), 5))
      .withColumn("corr3", tsCorrCf(col("r_open"), col("r_vol"), 10))
      .withColumn("corr6", tsCorrCf(col("open"), col("volume").cast(DoubleType), 10))
      .withColumn("tsr_low9", tsRankAvg(col("r_low"), 9))
      .withColumn("tsr_close10", tsRankAvg(col("close"), 10))
      .withColumn("corr48", tsCorrCf(col("dc1"), col("dc1l"), 250))
      .withColumn("a48num", div(col("corr48") * col("dc1"), col("close")))
      .withColumn("r_stoch", xr(col("stoch12")))
      .withColumn("r_sgn3", xr(col("sgn3")))
      .withColumn("r_a10", xr(col("a10base")))
      .withColumn("tsr_vol32", tsRankAvg(col("vold"), 32))
      .withColumn("tsr_chl16", tsRankAvg(col("chl"), 16))
      .withColumn("tsr_ret32", tsRankAvg(col("ret"), 32))
      .withColumn("corr_oc200", tsCorrCf(col("ocl"), col("close"), 200))
      .withColumn("corr_hv10", tsCorrCf(col("high"), col("vold"), 10))
      .withColumn("tsr_ar20", tsRankAvg(col("aratio"), 20))
      .withColumn("tsr_md7_8", tsRankAvg(-col("dc7"), 8))
      .withColumn("corr_hrv5", tsCorrCf(col("high"), col("r_vol"), 5))
      .withColumn("corr_rvv5", tsCorrCf(col("r_vol"), col("r_vwap"), 5))
      .withColumn("corr_rsv6", tsCorrCf(col("r_stoch"), col("r_vol"), 6))
      .withColumn("cov_rc_rv5", tsCovCf(col("r_close"), col("r_vol"), 5))
      .withColumn("cov_rh_rv5", tsCovCf(col("r_high"), col("r_vol"), 5))
      .withColumn("corr_rh_rv3", tsCorrCf(col("r_high"), col("r_vol"), 3))
      .withColumn("corr_002", tsCorrCf(col("r_vr2"), col("r_coo"), 6))
      .withColumn("a26max", max(col("corr_tsr5")).over(t(3)))
      .withColumn("corr_rvv6", tsCorrCf(col("r_vol"), col("r_vwap"), 6))
      .withColumn("s27", sum(col("corr_rvv6")).over(t(2)) / 2.0)
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
      // ---- tranche 2 ----
      .withColumn("alpha_009",
        when(col("tsmin_dc1_5") > 0, col("dc1"))
          .when(col("tsmax_dc1_5") < 0, col("dc1")).otherwise(-col("dc1")))
      .withColumn("alpha_010", col("r_a10"))
      .withColumn("alpha_019",
        -signum(col("dc7") + col("dc7")) * (lit(1.0) + col("r_sr250")))
      .withColumn("alpha_022", -(col("dcorr5") * col("r_stdc20")))
      .withColumn("alpha_023",
        when(col("mh20") < col("high"), lit(-1.0) * col("dh2")).otherwise(0.0))
      .withColumn("alpha_024",
        when(div(col("m100d"), col("c_lag100")) <= 0.05,
          -(col("close") - col("tsminc100"))).otherwise(-col("dc3")))
      .withColumn("alpha_030",
        div((lit(1.0) - col("r_sgn3")) * col("sv5"), col("sv20")))
      .withColumn("alpha_034",
        xr((lit(1.0) - col("r_ratio34")) + (lit(1.0) - col("r_dc1"))))
      .withColumn("alpha_035",
        col("tsr_vol32") * (lit(1.0) - col("tsr_chl16")) * (lit(1.0) - col("tsr_ret32")))
      .withColumn("alpha_037", xr(col("corr_oc200")) + col("r_oc"))
      .withColumn("alpha_040", -col("r_stdh10") * col("corr_hv10"))
      .withColumn("alpha_043", col("tsr_ar20") * col("tsr_md7_8"))
      .withColumn("alpha_044", -col("corr_hrv5"))
      .withColumn("alpha_046",
        when(lit(0.25) < col("ladder"), -1.0)
          .when(col("ladder") < 0, 1.0).otherwise(lit(-1.0) * col("dc1")))
      .withColumn("alpha_049",
        when(col("ladder") < -0.1, 1.0).otherwise(lit(-1.0) * col("dc1")))
      .withColumn("alpha_051",
        when(col("ladder") < -0.05, 1.0).otherwise(lit(-1.0) * col("dc1")))
      .withColumn("alpha_055", -col("corr_rsv6"))
      .withColumn("r_c50", xr(col("corr_rvv5")))
      // ---- tranche 3 ----
      .withColumn("alpha_002", -col("corr_002"))
      .withColumn("alpha_005",
        xr(round(col("open") - col("svw10") / 10.0, 6)) * -abs(xr(col("cmv"))))
      .withColumn("alpha_011",
        (xr(col("tsmax_vmc3")) + xr(col("tsmin_vmc3"))) * xr(col("dv3")))
      .withColumn("alpha_013", -xr(col("cov_rc_rv5")))
      .withColumn("alpha_014", -xr(col("dret3")) * col("corr6"))
      .withColumn("alpha_016", -xr(col("cov_rh_rv5")))
      .withColumn("alpha_017",
        -xr(col("tsr_close10")) * xr(col("ddc1")) * xr(col("tsr_var17_5")))
      .withColumn("alpha_018",
        -xr(col("std_absco5") + (col("close") - col("open")) + col("corr_co10")))
      .withColumn("alpha_025",
        xr(-col("ret") * col("adv20") * col("vwap") * col("hc")))
      .withColumn("alpha_026", -col("a26max"))
      .withColumn("a28x", col("corr_adv_low5") + col("hl2") - col("close"))
      .withColumn("x32a", col("sc7") / 7.0 - col("close"))
      .withColumn("alpha_045", -(xr(col("smdc520") / 20.0) * col("corr_c_v2")
        * xr(col("corr_s5_s20"))))
      .withColumn("alpha_052", (-col("a52min") + col("a52minl"))
        * xr(round((col("sr240") - col("sr20r")) / 220.0, 6)) * col("tsr_v5"))
      .withColumn("r_am30", xr(col("argmax_c30")))
      .withColumn("r_am10", xr(col("argmax_c10")))
      .withColumn("r_ibsv", xr(col("ibsv")))
      .withColumn("r_c15", xr(col("corr_rh_rv3")))
      // ---- tranche 4 ----
      .withColumn("alpha_021",
        when(col("mean_c8") + col("std_c8cf") < col("mean_c2"), -1.0)
          .when(col("mean_c2") < col("mean_c8") - col("std_c8cf"), 1.0)
          .when(col("aratio") < 1, -1.0).otherwise(1.0))
      .withColumn("alpha_027",
        when(lit(0.5) < xr(col("s27")), -1.0).otherwise(1.0))
      .withColumn("r_dl39", xr(col("dl_var17_9")))
      .withColumn("alpha_061",
        (xr(col("vwap") - col("tsmin_vw16")) < xr(col("corr_vw_adv18")))
          .cast(DoubleType))
      .withColumn("alpha_039",
        -xr(col("dc7") * (lit(1.0) - col("r_dl39"))) * (lit(1.0) + col("r_sr250")))
      // ---- final TS / scale pass over materialized ranks ----
      .withColumn("alpha_050", -max(col("r_c50")).over(t(5)))
      .withColumn("alpha_015", -sum(col("r_c15")).over(t(3)))
      .withColumn("alpha_057",
        -div(col("close") - col("vwap"), graft.ops.TsOps.decayLinear(col("r_am30"), 2, W)))
      .withColumn("alpha_028", XsOps.scale(col("a28x"), 1.0, col("day")))
      .withColumn("alpha_032", XsOps.scale(col("x32a"), 1.0, col("day"))
        + lit(20.0) * XsOps.scale(col("corr_v_vw230"), 1.0, col("day")))
      .withColumn("alpha_060", -(lit(2.0) * XsOps.scale(col("r_ibsv"), 1.0, col("day"))
        - XsOps.scale(col("r_am10"), 1.0, col("day"))))
  }

  /** Implemented alpha columns, batches 1-4 (q46/q47/q59/q60). */
  val batch1: Seq[String] = Seq(
    "alpha_001", "alpha_003", "alpha_004", "alpha_006", "alpha_008",
    "alpha_012", "alpha_020")
  val batch2: Seq[String] = Seq(
    "alpha_033", "alpha_038", "alpha_041", "alpha_042", "alpha_048",
    "alpha_053", "alpha_054", "alpha_101")
  val batch3: Seq[String] = Seq(
    "alpha_009", "alpha_010", "alpha_019", "alpha_022", "alpha_023",
    "alpha_024", "alpha_030", "alpha_034")
  val batch4: Seq[String] = Seq(
    "alpha_035", "alpha_037", "alpha_040", "alpha_043", "alpha_044",
    "alpha_046", "alpha_049", "alpha_050", "alpha_051", "alpha_055")
  val batch5: Seq[String] = Seq(
    "alpha_002", "alpha_005", "alpha_011", "alpha_013", "alpha_014",
    "alpha_015", "alpha_016", "alpha_017")
  val batch6: Seq[String] = Seq(
    "alpha_018", "alpha_025", "alpha_026", "alpha_028", "alpha_032",
    "alpha_045", "alpha_052", "alpha_057", "alpha_060")
  val batch7: Seq[String] = Seq(
    "alpha_021", "alpha_027", "alpha_039", "alpha_061")
  val columns: Seq[String] =
    batch1 ++ batch2 ++ batch3 ++ batch4 ++ batch5 ++ batch6 ++ batch7
}
