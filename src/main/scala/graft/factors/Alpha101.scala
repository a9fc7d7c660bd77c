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

  /** q169's streamed-slice kernel: ONLY the seven bounded-lookback
    * alphas of the streamed alpha mart
    * (`FactorQueries.streamAlphaSlice`), expressed with the SAME
    * private helpers (div / q20 / tsRankAvg / W) and the same
    * expression text as [[compute]]'s stages — but as a ~15-column
    * plan instead of the ~500-column full DAG, whose Catalyst
    * ANALYSIS alone costs ~10 s per plan: the maintenance stream
    * plans 4 times (historical + 3 batches), which made the q169
    * entry a flat 41 s at every SF. XS ranks use [[XsOps.rankPct]]
    * directly — the single-window form of the MultiRank batched
    * pass (same values by construction). Bit-identity of every
    * slice column against the full [[compute]] DAG is pinned by
    * StreamMartSpec, so the two definitions cannot drift silently. */
  def computeStreamSlice(quotes: DataFrame): DataFrame = {
    def xr(x: Column): Column = XsOps.rankPct(x, col("day"))
    val vw = q20(col("vwap"))
    quotes
      .withColumn("dc1", col("close") - lag(col("close"), 1).over(W))
      .withColumn("dv1", (col("volume") - lag(col("volume"), 1).over(W)).cast(DoubleType))
      .withColumn("ophl", col("open") - lag(col("high"), 1).over(W))
      .withColumn("opcl", col("open") - lag(col("close"), 1).over(W))
      .withColumn("opll", col("open") - lag(col("low"), 1).over(W))
      .withColumn("kline", div((col("close") - col("low")) - (col("high") - col("close")),
        col("close") - col("low")))
      .withColumn("a53", -(col("kline") - lag(col("kline"), 9).over(W)))
      .withColumn("r_low", xr(col("low")))
      .withColumn("tsr_low9", tsRankAvg(col("r_low"), 9))
      .withColumn("alpha_004", -col("tsr_low9"))
      .withColumn("alpha_012", signum(col("dv1")) * -col("dc1"))
      .withColumn("alpha_020", -xr(col("ophl")) * xr(col("opcl")) * xr(col("opll")))
      .withColumn("alpha_033", xr(-(lit(1.0) - div(col("open"), col("close")))))
      .withColumn("alpha_042", div(xr(vw - col("close")), xr(vw + col("close"))))
      .withColumn("alpha_053", col("a53"))
      .withColumn("alpha_101",
        (col("close") - col("open")) / (col("high") - col("low") + lit(0.001)))
  }

  private def div(num: Column, den: Column): Column =
    when(den =!= 0.0, num / den)

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
    * history). One native fold ([[graft.expressions.TsRankAvgFold]],
    * r20: replaces two interpreted `size(filter(...))` HOF passes per
    * row; bit-identical by the fold's comparator contract, pinned by
    * the hash-exact q90 goldens). */
  private def tsRankAvg(x: Column, d: Int): Column = {
    val arr = collect_list(x).over(t(d))
    graft.ops.TsOps.bridged2(graft.expressions.TsRankAvgFold.apply)(arr, x)
  }

  /** np.argmax over the trailing window: 0-based first-max index
    * from the window start (nulls dropped by collect_list). */
  private def tsArgMaxIdx(x: Column, d: Int): Column = {
    val arr = collect_list(x).over(t(d))
    (array_position(arr, array_max(arr)) - 1).cast(DoubleType)
  }

  /** np.argmin over the trailing window: 0-based first-min index
    * from the window start (nulls dropped by collect_list). */
  private def tsArgMinIdx(x: Column, d: Int): Column = {
    val arr = collect_list(x).over(t(d))
    (array_position(arr, array_min(arr)) - 1).cast(DoubleType)
  }

  /** decay_linear for NULLABLE inputs with slot-preserving weights:
    * null entries keep their weight slot but contribute 0 (mirrors
    * the DuckDB `list()` + `list_sum` oracle, where nulls stay in the
    * list and the sum skips them); all-null window -> null. NaN is
    * the in-flight null marker (the pipeline never produces NaN). */
  private def dlNullSlot(x: Column, d: Int): Column = {
    val arr = collect_list(coalesce(x, lit(Double.NaN))).over(t(d))
    graft.ops.TsOps.bridged1(
      graft.expressions.DecayLinearFold(_, nullSlot = true))(arr)
  }

  /** product(x, d): sequential fold over the non-null window values
    * (alpha101_engine.py:69-72); all-null window -> null, matching
    * DuckDB's aggregate-over-empty-list. */
  private def tsProd(x: Column, d: Int): Column =
    graft.ops.TsOps.bridged1(graft.expressions.ProdFold.apply)(
      collect_list(x).over(t(d)))

  /** Null-skipping pairwise max/min with EXPLICIT case logic — Spark
    * greatest/least and DuckDB greatest/least differ on null inputs,
    * so both sides spell out the same CASE chain. */
  private def maxN(a: Column, b: Column): Column =
    when(a.isNull, b).when(b.isNull, a).when(a >= b, a).otherwise(b)
  private def minN(a: Column, b: Column): Column =
    when(a.isNull, b).when(b.isNull, a).when(a <= b, a).otherwise(b)

  /** Pinned signedpower guard for alpha_084: the synthetic panel's
    * close deltas reach +-200, so rank^delta spans ~1e-300..1e300 —
    * far past where a 6-dp rounded compare is meaningful. Outputs are
    * clamped to +-1e6 (documented divergence; real-market deltas are
    * single digits and never clamp). */
  private def clamp1e6(x: Column): Column =
    when(x > 1e6, 1e6).when(x < -1e6, -1e6).otherwise(x)

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

  /** Quantize to the 2^-20 grain (floor(x·2^20 + 0.5)/2^20): every
    * step is a single correctly-rounded IEEE op (×2^20 and /2^20 are
    * exact exponent shifts), so identical inputs give bit-identical
    * results in every engine — AND the result is a multiple of 2^-20,
    * i.e. exactly representable, so window/group SUMS over it are
    * exact and summation-order-independent. Applied to vwap and the
    * weighted-price wp* columns, whose raw values are full-precision
    * products: avg(wp79) over (day, industry) differed between
    * Spark's running accumulation and DuckDB's segment tree at ~1e-13,
    * which flipped the 6-dp rounding of d79r on ~200/10k rows
    * (alpha_079's round-5 hash mismatch). */
  private def q20(x: Column): Column =
    floor(x * 1048576.0 + lit(0.5)) / 1048576.0

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
    // The whole pipeline is recorded as ONE deferred chain and built
    // as batched dependency layers ([[graft.ops.PlanOps.ColChain]]):
    // per-column withColumn analysis at ~330 derived columns was
    // ~5 min of driver-side planning per entry (round-5 bench).
    // The s0..s10 vals remain purely documentation of the TS/XS
    // stage alternation; batching is dependency-driven.
    // Cross-sectional pct-ranks go through the RankRecorder:
    // `.withRank(name, x)` for standalone rank columns, `xr(x)` for
    // ranks embedded in a larger expression (hoisted automatically).
    // Both lower to batched per-day MultiRank group passes
    // ([[graft.plans.MultiRankNode]]) instead of one WindowExec Sort
    // per rank ordering — same values, ~130 fewer full-panel sorts.
    val rk = new graft.ops.PlanOps.RankRecorder("day")
    def xr(x: Column): Column = rk.rank(x)
    // ---- TS stage 0: lags, deltas, running sums ----
    val s0 = graft.ops.PlanOps.ColChain(quotes, rec = Some(rk))
      .withColumn("vwap", q20(col("vwap")))
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
      .withColumn("dc4", col("close") - lag(col("close"), 4).over(W))
      .withColumn("dvw5", col("vwap") - lag(col("vwap"), 5).over(W))
      .withColumn("voldl1", lag(col("vold"), 1).over(W))
      .withColumn("nretl6", lag(-col("ret"), 6).over(W))
      .withColumn("capret", col("ret") * col("total_mv"))
      // adv{d} family for the 062-100 band
      .withColumn("adv5", avg(col("amount")).over(t(5)))
      .withColumn("adv10", avg(col("amount")).over(t(10)))
      .withColumn("adv15", avg(col("amount")).over(t(15)))
      .withColumn("adv30", avg(col("amount")).over(t(30)))
      .withColumn("adv40", avg(col("amount")).over(t(40)))
      .withColumn("adv50", avg(col("amount")).over(t(50)))
      .withColumn("adv60", avg(col("amount")).over(t(60)))
      .withColumn("adv81", avg(col("amount")).over(t(81)))
      .withColumn("adv120", avg(col("amount")).over(t(120)))
      .withColumn("adv150", avg(col("amount")).over(t(150)))
      .withColumn("dvw1", col("vwap") - lag(col("vwap"), 1).over(W))
      .withColumn("dvw3", col("vwap") - lag(col("vwap"), 3).over(W))
      .withColumn("dvw4", col("vwap") - lag(col("vwap"), 4).over(W))
      .withColumn("do1", col("open") - lag(col("open"), 1).over(W))
      .withColumn("do2", col("open") - lag(col("open"), 2).over(W))
      .withColumn("o_min13", col("open") - min(col("open")).over(t(13)))
      .withColumn("om12", col("open") - min(col("open")).over(t(12)))
      .withColumn("vm11", col("vwap") - min(col("vwap")).over(t(11)))
      .withColumn("so12", sum(col("open")).over(t(12)))
      .withColumn("s19hl2", sum(col("hl2")).over(t(19)))
      .withColumn("wp74", q20(col("high") * 0.0261661 + col("vwap") * 0.9738339))
      .withColumn("wp78", q20(col("low") * 0.352233 + col("vwap") * 0.647767))
      .withColumn("wp85", q20(col("high") * 0.876703 + col("close") * 0.123297))
      .withColumn("b92",
        when((col("hl2") + col("close")) < (col("low") + col("open")), 1.0).otherwise(0.0))
      .withColumn("x71", (col("low") + col("open")) - (lit(2.0) * col("vwap")))
      .withColumn("x77", col("hl2") - col("vwap"))
      .withColumn("wp79", q20(col("close") * 0.60733 + col("open") * 0.39267))
      .withColumn("wp80", q20(col("open") * 0.868128 + col("high") * 0.131872))
      .withColumn("wp87", q20(col("close") * 0.369701 + col("vwap") * 0.630299))
      .withColumn("wp93", q20(col("close") * 0.524434 + col("vwap") * 0.475566))
      .withColumn("wp97", q20(col("low") * 0.721001 + col("vwap") * 0.278999))
      .withColumn("hm2", col("high") - max(col("high")).over(t(2)))
      .withColumn("cm4", col("close") - max(col("close")).over(t(4)))
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
      .withColumn("dc5", col("close") - col("c5l"))
      .withColumn("dc10", col("close") - col("c_lag10"))
      .withColumn("tsr_absdc7_60", tsRankAvg(abs(col("dc7")), 60))
      .withColumn("mean_c200", avg(col("close")).over(t(200)))
      .withColumn("sh5", sum(col("high")).over(t(5)))
      .withColumn("vmax15", col("vwap") - max(col("vwap")).over(t(15)))
      .withColumn("sr10", sum(col("ret")).over(t(10)))
      .withColumn("sret2", sum(col("ret")).over(t(2)))
      .withColumn("c36a", tsCorrCf(-col("oc"), col("voldl1"), 15))
      .withColumn("c36b", round(tsCorrCf(col("vwap"), col("adv20"), 6), 6))
      .withColumn("c31", round(tsCorrCf(col("adv20"), col("low"), 12), 6))
      .withColumn("tsr_nret6_5", tsRankAvg(col("nretl6"), 5))
      .withColumn("dhl3", col("hl2") - lag(col("hl2"), 3).over(W))
      .withColumn("ibs66", div(col("low") - col("vwap"), col("open") - col("hl2")))
      .withColumn("x73", div(-col("do2"), col("open")))
      .withColumn("tsr_c3", tsRankAvg(col("close"), 3))
      .withColumn("tsr_adv180_12", tsRankAvg(col("adv180"), 12))
      .withColumn("tsr_vw3", tsRankAvg(col("vwap"), 3))
      .withColumn("tsr_v18", tsRankAvg(col("vold"), 18))
      .withColumn("tsr_c8", tsRankAvg(col("close"), 8))
      .withColumn("tsr_adv60_20", tsRankAvg(col("adv60"), 20))
      .withColumn("tsr_vw19", tsRankAvg(col("vwap"), 19))
      .withColumn("tsr_adv60_4", tsRankAvg(col("adv60"), 4))
      .withColumn("tsr_c7", tsRankAvg(col("close"), 7))
      .withColumn("tsr_hl2_3", tsRankAvg(col("hl2"), 3))
      .withColumn("tsr_v10", tsRankAvg(col("vold"), 10))
      .withColumn("s22adv20", sum(col("adv20")).over(t(22)))
      .withColumn("s14adv20", sum(col("adv20")).over(t(14)))
      .withColumn("s37adv30", sum(col("adv30")).over(t(37)))
      .withColumn("s8adv60", sum(col("adv60")).over(t(8)))
      .withColumn("s19adv60", sum(col("adv60")).over(t(19)))
      .withColumn("s12adv120", sum(col("adv120")).over(t(12)))
      .withColumn("s19adv40", sum(col("adv40")).over(t(19)))
      .withColumn("s26adv5", sum(col("adv5")).over(t(26)))
      .withColumn("s19wp78", sum(col("wp78")).over(t(19)))
      .withColumn("dl66a", dlNullSlot(col("dvw3"), 7))
      .withColumn("dl73a", dlNullSlot(col("dvw4"), 2))
      .withColumn("dl77a", dlNullSlot(col("x77"), 20))
      .withColumn("dl92a", dlNullSlot(col("b92"), 14))
      .withColumn("c72a", round(tsCorrCf(col("hl2"), col("adv40"), 8), 6))
      .withColumn("c77", round(tsCorrCf(col("hl2"), col("adv40"), 3), 6))
      .withColumn("c85a", round(tsCorrCf(col("wp85"), col("adv30"), 9), 6))
      .withColumn("c75a", tsCorrCf(col("vwap"), col("vold"), 4))
      .withColumn("c99b", tsCorrCf(col("low"), col("vold"), 6))
      .withColumn("s37adv180", sum(col("adv180")).over(t(37)))
      .withColumn("s49adv10", sum(col("adv10")).over(t(49)))
      .withColumn("tsr_adv150_9", tsRankAvg(col("adv150"), 9))
      .withColumn("tsr_low7", tsRankAvg(col("low"), 7))
      .withColumn("tsr_adv60_17", tsRankAvg(col("adv60"), 17))
      .withColumn("c69", round(tsCorrCf(col("close"), col("adv20"), 4), 6))
      .withColumn("c80", round(tsCorrCf(col("high"), col("adv10"), 5), 6))
      .withColumn("c89", round(tsCorrCf(col("low"), col("adv10"), 6), 6))
      .withColumn("c91b", round(tsCorrCf(col("vwap"), col("adv30"), 4), 6))
      .withColumn("dl76a", dlNullSlot(col("dvw1"), 11))
      .withColumn("dl82a", dlNullSlot(col("do1"), 14))
      // rounded: engine FMA contraction puts ~1e-14 noise on the
      // float-coefficient wp products, which flips rank order of
      // mathematically-tied deltas (same reason d79r/d97r round)
      .withColumn("d87", round(col("wp87") - lag(col("wp87"), 1).over(W), 6))
      .withColumn("d93", round(col("wp93") - lag(col("wp93"), 2).over(W), 6))
      .withColumn("amn100", tsArgMinIdx(col("close"), 30))
    // ---- XS stage: input ranks; TS follow-ups on materialized cols
    val s2 = s1
      .withColumn("a8diff", col("a8base") - lag(col("a8base"), 10).over(W))
      .withColumn("a1sig", XsOps.signedPower(
        when(col("ret") < 0, col("std20")).otherwise(col("close")), 2.0))
      .withRank("r_open", col("open"))
      .withRank("r_vol", col("volume"))
      .withRank("r_low", col("low"))
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
      .withRank("r_vwap", col("vwap"))
      .withRank("r_stdc20", varSurrogate(col("close"), 20))
      .withRank("r_stdh10", varSurrogate(col("high"), 10))
      .withColumn("ddc1", col("dc1") - col("dc1l"))
      .withColumn("a52minl", lag(col("a52min"), 5).over(W))
      .withColumn("corr_s5_s20", tsCorrCf(col("sc5"), col("sc20"), 2))
      .withColumn("corr_tsr5", tsCorrCf(col("tsr_v5"), col("tsr_h5"), 5))
      .withRank("r_close", col("close"))
      .withRank("r_high", col("high"))
      .withRank("r_vr2", col("vr2"))
      .withRank("r_coo", col("coo"))
      .withRank("r_dc1", col("dc1"))
      .withRank("r_oc", col("oc"))
      .withRank("r_sr250", round(lit(1.0) + col("sr250"), 6))
      .withRank("r_ratio34", round(div(col("stdr2"), col("stdr5")), 6))
      .withRank("r29a", col("dc5"))
      .withRank("r31a", col("dc10"))
      .withRank("r31f", -col("dc3"))
      .withRank("r36a", col("c36a"))
      .withRank("r36d", abs(col("c36b")))
      .withRank("r36e", (col("mean_c200") - col("open")) * (col("close") - col("open")))
      .withRank("r47a", lit(1.0) / col("close"))
      .withRank("r47b", col("hc"))
      .withRank("r47c", col("dvw5"))
      .withRank("r56b", col("capret"))
      .withColumn("ss23", sum(col("sret2")).over(t(3)))
      .withColumn("tsr84", tsRankAvg(col("vmax15"), 20))
      .withColumn("sign31",
        signum(div(col("c31"), sum(abs(col("c31"))).over(Window.partitionBy("day")))))
      .withColumn("hlr", (col("high") - col("low")) / (col("sc5") / 5.0))
      .withRank("r_hl2", col("hl2"))
      .withRank("r_adv15", col("adv15"))
      .withRank("r_adv30", col("adv30"))
      .withRank("r_adv50", col("adv50"))
      .withRank("r64b", col("dhl3"))
      .withRank("r65b", col("o_min13"))
      .withRank("r95a", col("om12"))
      .withRank("r94a", col("vm11"))
      .withRank("r71b", col("x71"))
      .withRank("r66a", col("dl66a"))
      .withRank("r73a", col("dl73a"))
      .withRank("r77a", col("dl77a"))
      .withRank("r_wp74", col("wp74"))
      .withRank("r85a", col("c85a"))
      .withRank("r75a", col("c75a"))
      .withRank("r99b", col("c99b"))
      .withColumn("tsr92a", tsRankAvg(col("dl92a"), 18))
      .withColumn("dl66b", dlNullSlot(col("ibs66"), 11))
      .withColumn("dl73b", dlNullSlot(col("x73"), 3))
      .withColumn("dl72a", dlNullSlot(col("c72a"), 10))
      .withColumn("dl77b", dlNullSlot(col("c77"), 5))
      .withColumn("c62", round(tsCorrCf(col("vwap"), col("s22adv20"), 9), 6))
      .withColumn("c64", round(tsCorrCf(col("so12"), col("s12adv120"), 16), 6))
      .withColumn("c65", round(tsCorrCf(col("open"), col("s8adv60"), 6), 6))
      .withColumn("c86", round(tsCorrCf(col("close"), col("s14adv20"), 6), 6))
      .withColumn("c74a", round(tsCorrCf(col("close"), col("s37adv30"), 15), 6))
      .withColumn("c78a", round(tsCorrCf(col("s19wp78"), col("s19adv40"), 6), 6))
      .withColumn("c95", round(tsCorrCf(col("s19hl2"), col("s19adv40"), 12), 6))
      .withColumn("c98a", round(tsCorrCf(col("vwap"), col("s26adv5"), 4), 6))
      .withColumn("c99a", round(tsCorrCf(col("s19hl2"), col("s19adv60"), 8), 6))
      .withColumn("c71", tsCorrCf(col("tsr_c3"), col("tsr_adv180_12"), 18))
      .withColumn("c72b", tsCorrCf(col("tsr_vw3"), col("tsr_v18"), 6))
      .withColumn("c85b", tsCorrCf(col("tsr_hl2_3"), col("tsr_v10"), 7))
      .withColumn("c88b", tsCorrCf(col("tsr_c8"), col("tsr_adv60_20"), 8))
      .withColumn("c94b", tsCorrCf(col("tsr_vw19"), col("tsr_adv60_4"), 18))
      .withColumn("c96b", tsCorrCf(col("tsr_c7"), col("tsr_adv60_4"), 3))
      // IndClass.sector/industry/subindustry all map to the panel's
      // single `industry` grouping (the reference's neut(), Project
      // report.md:749-757)
      .withColumn("nvwap", XsOps.demean(col("vwap"), col("day"), col("industry")))
      .withColumn("nclose", XsOps.demean(col("close"), col("day"), col("industry")))
      .withColumn("nlow", XsOps.demean(col("low"), col("day"), col("industry")))
      .withColumn("nvol", XsOps.demean(col("vold"), col("day"), col("industry")))
      .withColumn("nadv20", XsOps.demean(col("adv20"), col("day"), col("industry")))
      .withColumn("nadv40", XsOps.demean(col("adv40"), col("day"), col("industry")))
      .withColumn("nadv81", XsOps.demean(col("adv81"), col("day"), col("industry")))
      .withColumn("nwp79", XsOps.demean(col("wp79"), col("day"), col("industry")))
      .withColumn("nwp80", XsOps.demean(col("wp80"), col("day"), col("industry")))
      .withColumn("nwp97", XsOps.demean(col("wp97"), col("day"), col("industry")))
      .withRank("r67a", col("hm2"))
      .withRank("r70a", col("dvw1"))
      .withRank("r90a", col("cm4"))
      .withRank("r76a", col("dl76a"))
      .withRank("r82a", col("dl82a"))
      .withRank("r100b", col("amn100"))
      .withRank("r_adv20x", col("adv20"))
      .withColumn("tsr69", tsRankAvg(col("c69"), 9))
      .withColumn("tsr80", tsRankAvg(col("c80"), 5))
      .withColumn("dl89a", dlNullSlot(col("c89"), 5))
      .withColumn("dl91c", dlNullSlot(col("c91b"), 2))
      .withColumn("dl87a", dlNullSlot(col("d87"), 2))
      .withColumn("dl93b", dlNullSlot(col("d93"), 16))
      .withColumn("c79", tsCorrCf(col("tsr_vw3"), col("tsr_adv150_9"), 14))
      .withColumn("c97x", tsCorrCf(col("tsr_low7"), col("tsr_adv60_17"), 4))
      .withColumn("c81", round(tsCorrCf(col("vwap"), col("s49adv10"), 8), 6))
      .withColumn("c63", round(tsCorrCf(col("vwap"), col("s37adv180"), 13), 6))
    // ---- TS stage: correlations, ts_ranks, argmax ----
    val s3 = s2
      .withColumn("a1arg", tsArgMaxIdx(col("a1sig"), 5))
      .withColumn("corr3", tsCorrCf(col("r_open"), col("r_vol"), 10))
      .withColumn("corr6", tsCorrCf(col("open"), col("volume").cast(DoubleType), 10))
      .withColumn("tsr_low9", tsRankAvg(col("r_low"), 9))
      .withColumn("tsr_close10", tsRankAvg(col("close"), 10))
      .withColumn("corr48", tsCorrCf(col("dc1"), col("dc1l"), 250))
      .withColumn("a48num", div(col("corr48") * col("dc1"), col("close")))
      .withRank("r_stoch", col("stoch12"))
      .withRank("r_sgn3", col("sgn3"))
      .withRank("r_a10", col("a10base"))
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
      .withRank("r29b", -col("r29a"))
      .withRank("r31b", col("r31a"))
      .withRank("r36c", col("tsr_nret6_5"))
      .withColumn("q56x", round(div(col("sr10"), col("ss23")), 6))
      .withColumn("hlr_l2", lag(col("hlr"), 2).over(W))
      .withRank("r83b", col("r_vol"))
      .withColumn("p84", pow(col("tsr84"), col("dc4")))
      .withRank("r62a", col("c62"))
      .withRank("r64a", col("c64"))
      .withRank("r65a", col("c65"))
      .withColumn("tsr86", tsRankAvg(col("c86"), 20))
      .withRank("r74a", col("c74a"))
      .withColumn("c74b", round(tsCorrCf(col("r_wp74"), col("r_vol"), 11), 6))
      .withColumn("c75b", round(tsCorrCf(col("r_low"), col("r_adv50"), 12), 6))
      .withRank("r78a", col("c78a"))
      .withRank("r95b", col("c95"))
      .withColumn("dl98a", dlNullSlot(col("c98a"), 7))
      .withRank("r99a", col("c99a"))
      .withColumn("dl71a", dlNullSlot(col("c71"), 4))
      .withColumn("dl71b", dlNullSlot(col("r71b") * col("r71b"), 16))
      .withColumn("dl72b", dlNullSlot(col("c72b"), 2))
      .withRank("r85b", col("c85b"))
      .withColumn("x88", ((col("r_open") + col("r_low")) - col("r_high")) - col("r_close"))
      .withColumn("dl88b", dlNullSlot(col("c88b"), 6))
      .withColumn("tsr94", tsRankAvg(col("c94b"), 2))
      .withColumn("am96", tsArgMaxIdx(col("c96b"), 12))
      .withColumn("c96a", round(tsCorrCf(col("r_vwap"), col("r_vol"), 3), 6))
      .withColumn("c98b", round(tsCorrCf(col("r_open"), col("r_adv15"), 20), 6))
      .withColumn("c92", round(tsCorrCf(col("r_low"), col("r_adv30"), 7), 6))
      .withColumn("c68", round(tsCorrCf(col("r_high"), col("r_adv15"), 8), 6))
      .withColumn("b62",
        when((col("r_open") * 2) < (col("r_hl2") + col("r_high")), 1.0).otherwise(0.0))
      .withColumn("tsr66", tsRankAvg(col("dl66b"), 6))
      .withColumn("tsr73", tsRankAvg(col("dl73b"), 16))
      .withRank("r72a", col("dl72a"))
      .withRank("r77b", col("dl77b"))
      .withColumn("c58", round(tsCorrCf(col("nvwap"), col("vold"), 3), 6))
      .withColumn("c59", round(tsCorrCf(col("nvwap"), col("vold"), 4), 6))
      .withColumn("c67", round(tsCorrCf(col("nvwap"), col("nadv20"), 6), 6))
      .withColumn("c70", round(tsCorrCf(col("nclose"), col("adv50"), 17), 6))
      .withColumn("c76", round(tsCorrCf(col("nlow"), col("adv81"), 8), 6))
      .withColumn("c82", round(tsCorrCf(col("nvol"), col("open"), 17), 6))
      .withColumn("c87", round(tsCorrCf(col("nadv81"), col("close"), 13), 6))
      .withColumn("c90", round(tsCorrCf(col("nadv40"), col("low"), 5), 6))
      .withColumn("c91a", round(tsCorrCf(col("nclose"), col("vold"), 9), 6))
      .withColumn("c93", round(tsCorrCf(col("nvwap"), col("adv81"), 17), 6))
      .withColumn("c100", round(tsCorrCf(col("close"), col("r_adv20x"), 5), 6))
      .withColumn("d63r", round(col("nclose") - lag(col("nclose"), 2).over(W), 6))
      .withColumn("dnv2", col("nvwap") - lag(col("nvwap"), 2).over(W))
      .withColumn("d79r", round(col("nwp79") - lag(col("nwp79"), 1).over(W), 6))
      .withColumn("s80", signum(round(col("nwp80") - lag(col("nwp80"), 4).over(W), 6)))
      .withColumn("dnv3r", round(col("nvwap") - lag(col("nvwap"), 3).over(W), 6))
      .withColumn("d97r", round(col("nwp97") - lag(col("nwp97"), 3).over(W), 6))
      .withColumn("tsr89a", tsRankAvg(col("dl89a"), 3))
      .withRank("r91b", col("dl91c"))
      .withRank("r87a", col("dl87a"))
      .withRank("r93b", col("dl93b"))
      .withRank("r79b", col("c79"))
      .withColumn("tsr97a", tsRankAvg(col("c97x"), 18))
      .withRank("r81a", col("c81"))
      .withColumn("dl63b", dlNullSlot(col("c63"), 12))
    // ---- XS stage: final ranks + industry neutralization ----
    val s4 = s3
      .withColumn("alpha_001", xr(col("a1arg")) - lit(0.5))
      .withColumn("alpha_003", -col("corr3"))
      .withColumn("alpha_004", -col("tsr_low9"))
      .withColumn("alpha_006", -col("corr6"))
      .withColumn("alpha_008", -xr(col("a8diff")))
      .withColumn("alpha_012", signum(col("dv1")) * -col("dc1"))
      .withColumn("alpha_020", -xr(col("ophl")) * xr(col("opcl")) * xr(col("opll")))
      .withRank("alpha_033", -(lit(1.0) - div(col("open"), col("close"))))
      // shared XS rank: alpha_038 and alpha_017 rank the same ordering
      // (ts_rank(close,10)); one window pass serves both
      .withRank("r_tsrc10", col("tsr_close10"))
      .withColumn("alpha_038", -col("r_tsrc10") * xr(col("co")))
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
      .withRank("alpha_034", (lit(1.0) - col("r_ratio34")) + (lit(1.0) - col("r_dc1")))
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
      .withRank("r_c50", col("corr_rvv5"))
      // ---- tranche 3 ----
      .withColumn("alpha_002", -col("corr_002"))
      // shared XS rank: alpha_005 and alpha_086 both rank cmv
      .withRank("r_cmv", col("cmv"))
      .withColumn("alpha_005",
        xr(round(col("open") - col("svw10") / 10.0, 6)) * -abs(col("r_cmv")))
      .withColumn("alpha_011",
        (xr(col("tsmax_vmc3")) + xr(col("tsmin_vmc3"))) * xr(col("dv3")))
      .withColumn("alpha_013", -xr(col("cov_rc_rv5")))
      .withColumn("alpha_014", -xr(col("dret3")) * col("corr6"))
      .withColumn("alpha_016", -xr(col("cov_rh_rv5")))
      .withColumn("alpha_017",
        -col("r_tsrc10") * xr(col("ddc1")) * xr(col("tsr_var17_5")))
      .withColumn("alpha_018",
        -xr(col("std_absco5") + (col("close") - col("open")) + col("corr_co10")))
      .withRank("alpha_025", -col("ret") * col("adv20") * col("vwap") * col("hc"))
      .withColumn("alpha_026", -col("a26max"))
      .withColumn("a28x", col("corr_adv_low5") + col("hl2") - col("close"))
      .withColumn("x32a", col("sc7") / 7.0 - col("close"))
      .withColumn("alpha_045", -(xr(col("smdc520") / 20.0) * col("corr_c_v2")
        * xr(col("corr_s5_s20"))))
      .withColumn("alpha_052", (-col("a52min") + col("a52minl"))
        * xr(round((col("sr240") - col("sr20r")) / 220.0, 6)) * col("tsr_v5"))
      .withRank("r_am30", col("argmax_c30"))
      .withRank("r_am10", col("argmax_c10"))
      .withRank("r_ibsv", col("ibsv"))
      .withRank("r_c15", col("corr_rh_rv3"))
      // ---- tranche 4 ----
      .withColumn("alpha_021",
        when(col("mean_c8") + col("std_c8cf") < col("mean_c2"), -1.0)
          .when(col("mean_c2") < col("mean_c8") - col("std_c8cf"), 1.0)
          .when(col("aratio") < 1, -1.0).otherwise(1.0))
      .withColumn("alpha_027",
        when(lit(0.5) < xr(col("s27")), -1.0).otherwise(1.0))
      .withRank("r_dl39", col("dl_var17_9"))
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
    // ---- tranches 5-6: the 062-100 band + deep-nesting alphas ----
    // each val below is one more window-nesting level
    val s5 = s4
      .withRank("r29c", col("r29b"))
      .withColumn("dl31", dlNullSlot(-col("r31b"), 10))
      .withRank("r56a", col("q56x"))
      .withRank("r83a", col("hlr_l2"))
      .withRank("r62b", col("b62"))
      .withRank("r74c", col("c74b"))
      .withRank("r75b", col("c75b"))
      .withColumn("tsr95", tsRankAvg(
        ((col("r95b") * col("r95b")) * (col("r95b") * col("r95b"))) * col("r95b"), 11))
      .withColumn("tsr68", tsRankAvg(col("c68"), 13))
      .withColumn("dl92b", dlNullSlot(col("c92"), 6))
      .withColumn("dl96a", dlNullSlot(col("c96a"), 4))
      .withColumn("amn98", tsArgMinIdx(col("c98b"), 8))
      .withColumn("dl88a", dlNullSlot(col("x88"), 8))
      .withColumn("dl96b", dlNullSlot(col("am96"), 14))
      .withColumn("tsr71a", tsRankAvg(col("dl71a"), 15))
      .withColumn("tsr71b", tsRankAvg(col("dl71b"), 4))
      .withRank("r72b", col("dl72b"))
      .withColumn("tsr88", tsRankAvg(col("dl88b"), 2))
      .withRank("r98a", col("dl98a"))
      .withColumn("dl58", dlNullSlot(col("c58"), 7))
      .withColumn("dl59", dlNullSlot(col("c59"), 16))
      .withColumn("dl63a", dlNullSlot(col("d63r"), 8))
      .withRank("r63b", col("dl63b"))
      .withRank("r67b", col("c67"))
      .withColumn("m69", round(max(col("dnv2")).over(t(4)), 6))
      .withColumn("tsr70", tsRankAvg(col("c70"), 17))
      .withColumn("tsr76a", tsRankAvg(col("c76"), 19))
      .withRank("r79a", col("d79r"))
      .withRank("r80a", col("s80"))
      .withColumn("dl82b", dlNullSlot(col("c82"), 6))
      .withColumn("dl87b", dlNullSlot(abs(col("c87")), 4))
      .withColumn("dl89b", dlNullSlot(col("dnv3r"), 10))
      .withColumn("tsr90", tsRankAvg(col("c90"), 3))
      .withColumn("dl91a", dlNullSlot(col("c91a"), 16))
      .withColumn("dl93a", dlNullSlot(col("c93"), 19))
      .withColumn("dl97a", dlNullSlot(col("d97r"), 20))
      .withColumn("dl97b", dlNullSlot(col("tsr97a"), 15))
      .withColumn("inner100", col("c100") - col("r100b"))
      .withRank("r81b", (col("r81a") * col("r81a")) * (col("r81a") * col("r81a")))
    val s6 = s5
      .withColumn("m29", min(col("r29c")).over(t(2)))
      .withRank("r31c", col("dl31"))
      .withRank("r88a", col("dl88a"))
      .withColumn("tsr92b", tsRankAvg(col("dl92b"), 6))
      .withColumn("tsr96a", tsRankAvg(col("dl96a"), 8))
      .withColumn("tsr96b", tsRankAvg(col("dl96b"), 13))
      .withColumn("tsr98", tsRankAvg(col("amn98"), 6))
      .withColumn("tsr58", tsRankAvg(col("dl58"), 5))
      .withColumn("tsr59", tsRankAvg(col("dl59"), 8))
      .withRank("r63a", col("dl63a"))
      .withRank("r69a", col("m69"))
      .withColumn("dl76b", dlNullSlot(col("tsr76a"), 17))
      .withColumn("tsr82", tsRankAvg(col("dl82b"), 13))
      .withColumn("tsr87", tsRankAvg(col("dl87b"), 14))
      .withColumn("tsr89b", tsRankAvg(col("dl89b"), 15))
      .withColumn("dl91b", dlNullSlot(col("dl91a"), 3))
      .withColumn("tsr93", tsRankAvg(col("dl93a"), 7))
      .withRank("r97a", col("dl97a"))
      .withColumn("tsr97b", tsRankAvg(col("dl97b"), 6))
      .withColumn("n100b", XsOps.demean(col("inner100"), col("day"), col("industry")))
      .withColumn("pr81", tsProd(col("r81b"), 14))
    val s7 = s6
      .withColumn("sc29r", round(div(log(col("m29")),
        sum(abs(log(col("m29")))).over(Window.partitionBy("day"))), 6))
      .withRank("r31d", col("r31c"))
      .withColumn("dl98b", dlNullSlot(col("tsr98"), 8))
      .withColumn("tsr76b", tsRankAvg(col("dl76b"), 19))
      .withColumn("tsr91", tsRankAvg(col("dl91b"), 4))
      .withColumn("sc100b",
        div(col("n100b"), sum(abs(col("n100b"))).over(Window.partitionBy("day"))))
      .withColumn("nn100", XsOps.demean(col("r_ibsv"), col("day"), col("industry")))
      .withRank("r81c", round(log(col("pr81")), 6))
    val s8 = s7
      .withRank("r29d", col("sc29r"))
      .withRank("r31e", col("r31d"))
      .withRank("r98b", col("dl98b"))
      .withColumn("n100a", XsOps.demean(col("nn100"), col("day"), col("industry")))
    val s9 = s8
      .withRank("r29e", col("r29d"))
      .withColumn("sc100a",
        div(col("n100a"), sum(abs(col("n100a"))).over(Window.partitionBy("day"))))
    val s10 = s9
      .withColumn("m29b", min(col("r29e")).over(t(5)))
    (s10
      .withColumn("alpha_007",
        when(col("adv20") < col("amount"),
          -col("tsr_absdc7_60") * signum(col("dc7"))).otherwise(-1.0))
      .withColumn("alpha_029", col("m29b") + col("tsr_nret6_5"))
      .withColumn("alpha_031", col("r31e") + col("r31f") + col("sign31"))
      .withColumn("alpha_036",
        ((((lit(2.21) * col("r36a")) + (lit(0.7) * col("r_oc")))
          + (lit(0.73) * col("r36c"))) + col("r36d")) + (lit(0.6) * col("r36e")))
      .withColumn("alpha_047",
        div((col("r47a") * col("aratio")) * (col("high") * col("r47b")),
          col("sh5") / 5.0) - col("r47c"))
      .withColumn("alpha_056", -(col("r56a") * col("r56b")))
      .withColumn("alpha_083",
        div(col("r83a") * col("r83b"), div(col("hlr"), col("vmc") + 0.001)))
      .withColumn("alpha_084", clamp1e6(col("p84")))
      .withColumn("alpha_062", when(col("r62a") < col("r62b"), -1.0).otherwise(0.0))
      .withColumn("alpha_064", when(col("r64a") < col("r64b"), -1.0).otherwise(0.0))
      .withColumn("alpha_065", when(col("r65a") < col("r65b"), -1.0).otherwise(0.0))
      .withColumn("alpha_066", -(col("r66a") + col("tsr66")))
      .withColumn("alpha_068", when(col("tsr68") < col("r_dc1"), -1.0).otherwise(0.0))
      .withColumn("alpha_071", maxN(col("tsr71a"), col("tsr71b")))
      .withColumn("alpha_072", div(col("r72a"), col("r72b")))
      .withColumn("alpha_073", -maxN(col("r73a"), col("tsr73")))
      .withColumn("alpha_074", when(col("r74a") < col("r74c"), -1.0).otherwise(0.0))
      .withColumn("alpha_075", when(col("r75a") < col("r75b"), 1.0).otherwise(0.0))
      .withColumn("alpha_077", minN(col("r77a"), col("r77b")))
      .withColumn("alpha_078", pow(col("r78a"), col("r_c50")))
      .withColumn("alpha_085", pow(col("r85a"), col("r85b")))
      .withColumn("alpha_086", when(col("tsr86") < col("r_cmv"), -1.0).otherwise(0.0))
      .withColumn("alpha_088", minN(col("r88a"), col("tsr88")))
      .withColumn("alpha_092", minN(col("tsr92a"), col("tsr92b")))
      .withColumn("alpha_094", -pow(col("r94a"), col("tsr94")))
      .withColumn("alpha_095", when(col("r95a") < col("tsr95"), 1.0).otherwise(0.0))
      .withColumn("alpha_096", -maxN(col("tsr96a"), col("tsr96b")))
      .withColumn("alpha_098", col("r98a") - col("r98b"))
      .withColumn("alpha_099", when(col("r99a") < col("r99b"), -1.0).otherwise(0.0))
      .withColumn("alpha_058", -col("tsr58"))
      .withColumn("alpha_059", -col("tsr59"))
      .withColumn("alpha_063", -(col("r63a") - col("r63b")))
      .withColumn("alpha_067", -pow(col("r67a"), col("r67b")))
      .withColumn("alpha_069", -pow(col("r69a"), col("tsr69")))
      .withColumn("alpha_070", -pow(col("r70a"), col("tsr70")))
      .withColumn("alpha_076", -maxN(col("r76a"), col("tsr76b")))
      .withColumn("alpha_079", when(col("r79a") < col("r79b"), 1.0).otherwise(0.0))
      .withColumn("alpha_080", -pow(col("r80a"), col("tsr80")))
      .withColumn("alpha_081", when(col("r81c") < col("r_c50"), -1.0).otherwise(0.0))
      .withColumn("alpha_082", -minN(col("r82a"), col("tsr82")))
      .withColumn("alpha_087", -maxN(col("r87a"), col("tsr87")))
      .withColumn("alpha_089", col("tsr89a") - col("tsr89b"))
      .withColumn("alpha_090", -pow(col("r90a"), col("tsr90")))
      .withColumn("alpha_091", -(col("tsr91") - col("r91b")))
      .withColumn("alpha_093", div(col("tsr93"), col("r93b")))
      .withColumn("alpha_097", -(col("r97a") - col("tsr97b")))
      .withColumn("alpha_100",
        -(((lit(1.5) * col("sc100a")) - col("sc100b")) * col("aratio")))
      // liveness-pruned build: the output keeps the quotes base
      // columns + the 101 alphas; intermediates are dropped at the
      // earliest batch boundary where nothing later reads them —
      // narrower exchanges, window buffers, and codegen units
      ).buildKeeping(Some(quotes.columns.toSeq ++ columns))
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
  val batch8: Seq[String] = Seq(
    "alpha_007", "alpha_029", "alpha_031", "alpha_036", "alpha_047",
    "alpha_056", "alpha_083", "alpha_084")
  val batch9: Seq[String] = Seq(
    "alpha_062", "alpha_064", "alpha_065", "alpha_066", "alpha_068",
    "alpha_071", "alpha_072", "alpha_073", "alpha_074", "alpha_075",
    "alpha_077", "alpha_078", "alpha_085", "alpha_086", "alpha_088",
    "alpha_092", "alpha_094", "alpha_095", "alpha_096", "alpha_098",
    "alpha_099")
  val batch10: Seq[String] = Seq(
    "alpha_058", "alpha_059", "alpha_063", "alpha_067", "alpha_069",
    "alpha_070", "alpha_076", "alpha_079", "alpha_080", "alpha_081",
    "alpha_082", "alpha_087", "alpha_089", "alpha_090", "alpha_091",
    "alpha_093", "alpha_097", "alpha_100")
  val columns: Seq[String] =
    batch1 ++ batch2 ++ batch3 ++ batch4 ++ batch5 ++ batch6 ++ batch7 ++
      batch8 ++ batch9 ++ batch10
}
