package graft.factors

import graft.ops.TsOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Technical factor corpus — the non-recursive ~20 formulas of
  * `database/functions/basic factor_function.md:6-28` (columns
  * declared in `database/ddl/factor_db_ddl.md:86-108`), re-expressed
  * as Spark window expressions over the [[graft.sources.Quotes]]
  * panel. The recursive EMA family (macd/kdj/trix/force/mass) lives
  * in [[EmaFamily]].
  *
  * Conventions (pinned, tested in FactorSpec):
  *  - all rolling frames are trailing `rowsBetween(-(d-1), 0)`
  *    INCLUDING the current row, no min_periods (values from row 1);
  *  - fixed-denominator formulas (psy_12's /12) keep the fixed
  *    denominator even in the warm-up frame, per the formula text;
  *  - every division is null-guarded (ANSI mode): x/0 → null;
  *  - amihud_20 is scaled ×1e8 (illiquidity-per-hundred-million, the
  *    common presentation unit) — a deliberate deviation from the raw
  *    MA(|ret|/amount, 20) formula text, mirrored in the oracle;
  *  - ui_14's drawdown base is the trailing 14-day high (the same d
  *    as the averaging window).
  *
  * Scale: one window partition key (`stock`, high cardinality) for
  * all factors — Catalyst computes every frame in a single
  * WindowExec pass over one shuffle; cross-row state is O(frame).
  */
object Technical {

  private val W = Window.partitionBy("stock").orderBy("day")
  private def t(d: Int) = W.rowsBetween(-(d - 1), 0)

  /** Null-guarded division. */
  private def div(num: Column, den: Column): Column =
    when(den =!= 0.0, num / den)

  /** Adds the full non-EMA technical factor set to a quotes panel. */
  def compute(quotes: DataFrame): DataFrame = {
    val prevC = lag(col("close"), 1).over(W)
    val deltaC = col("close") - prevC
    // true range with the first-row null collapsed to high-low
    // (|h-c|<=h-l and |l-c|<=h-l, so the coalesce is semantics-free)
    val pc = coalesce(prevC, col("close"))
    val tr = greatest(col("high") - col("low"),
      abs(col("high") - pc), abs(col("low") - pc))
    val tp = (col("high") + col("low") + col("close")) / 3.0
    val ret = div(col("close"), prevC) - 1.0

    val withBase = quotes
      .withColumn("prev_c", prevC)
      .withColumn("delta_c", deltaC)
      .withColumn("tr", tr)
      .withColumn("tp", tp)
      .withColumn("ret", ret)
      .withColumn("mf_pos",
        when(col("tp") > lag(col("tp"), 1).over(W), col("tp") * col("volume")).otherwise(0.0))
      .withColumn("mf_neg",
        when(col("tp") < lag(col("tp"), 1).over(W), col("tp") * col("volume")).otherwise(0.0))
      .withColumn("up_move", when(col("delta_c") > 0, col("delta_c")).otherwise(0.0))
      .withColumn("dn_move", when(col("delta_c") < 0, -col("delta_c")).otherwise(0.0))
      // on-balance volume: cumulative signed volume (obv_slope input)
      .withColumn("obv", sum(signum(col("delta_c")) * col("volume"))
        .over(W.rowsBetween(Window.unboundedPreceding, Window.currentRow)))

    val ma20 = avg(col("close")).over(t(20))
    val ma60 = avg(col("close")).over(t(60))
    // closed-form exact-sum stddev (close is 1/64-grain exact):
    // engine-proof where the built-in's incremental moments are not
    val std20 = TsOps.tsStddevCf(col("close"), 20, W)
    val su14 = sum(col("up_move")).over(t(14))
    val sd14 = sum(col("dn_move")).over(t(14))
    val hh14 = max(col("high")).over(t(14))
    val ll14 = min(col("low")).over(t(14))
    val vwap20 = div(sum(col("amount")).over(t(20)), sum(col("volume")).over(t(20)))

    // cci mean deviation: the deviation is vs the SAME window's mean,
    // so it needs the window array (collect_list + HOF, q23 shape)
    val tpArr = collect_list(col("tp")).over(t(14))

    withBase
      .withColumn("ma_5", avg(col("close")).over(t(5)))
      .withColumn("ma_20", ma20)
      .withColumn("ma_60", ma60)
      .withColumn("bias_20", div(col("close") - ma20, ma20))
      .withColumn("bias_60", div(col("close") - ma60, ma60))
      .withColumn("boll_upper", ma20 + lit(2.0) * std20)
      .withColumn("boll_lower", ma20 - lit(2.0) * std20)
      .withColumn("rsi_14", div(lit(100.0) * su14, su14 + sd14))
      .withColumn("atr_14", avg(col("tr")).over(t(14)))
      .withColumn("tp_arr", tpArr)
      // window mean (cheaper than re-folding the array; same value)
      .withColumn("tp_m", avg(col("tp")).over(t(14)))
      .withColumn("tp_md", TsOps.bridged2(
        graft.expressions.MeanAbsDevFold.apply)(col("tp_arr"), col("tp_m")))
      .withColumn("cci_14", div(col("tp") - col("tp_m"), lit(0.015) * col("tp_md")))
      .withColumn("wr_14", div(hh14 - col("close"), hh14 - ll14) * -100.0)
      .withColumn("mfi_14", div(lit(100.0) * sum(col("mf_pos")).over(t(14)),
        sum(col("mf_pos")).over(t(14)) + sum(col("mf_neg")).over(t(14))))
      .withColumn("vroc_20", div(col("volume").cast("double"),
        lag(col("volume"), 20).over(W).cast("double")) - lit(1.0))
      .withColumn("obv_slope_20", (col("obv") - lag(col("obv"), 20).over(W)) / 20.0)
      .withColumn("vwap_bias_20", div(col("close") - vwap20, vwap20))
      .withColumn("psy_12",
        sum(when(col("delta_c") > 0, 1.0).otherwise(0.0)).over(t(12)) / 12.0 * 100.0)
      // drawdown must be a materialized column: a window expression
      // can't nest inside another window aggregate's argument
      .withColumn("dd_pct",
        (div(col("close"), max(col("close")).over(t(14))) - 1.0) * 100.0)
      .withColumn("ui_14", sqrt(avg(col("dd_pct") * col("dd_pct")).over(t(14))))
      .withColumn("amihud_20", avg(div(abs(col("ret")), col("amount"))).over(t(20)) * 1e8)
      .withColumn("aroon_osc_25",
        (TsOps.tsArgMin(col("low"), 25, W) - TsOps.tsArgMax(col("high"), 25, W)) * 4.0)
      .withColumn("chop_14",
        lit(100.0) * log10(div(sum(col("tr")).over(t(14)), hh14 - ll14))
          / lit(math.log10(14.0)))
      // std(turnover) computed as std(volume)/1e5: turnover itself
      // (volume/1e5) is an INEXACT double whose power sums are
      // accumulation-order-dependent, but the integer volumes' sums
      // are exact — same value, engine-proof (tsStddevCf's contract)
      .withColumn("turnover_std_20",
        TsOps.tsStddevCf(col("volume").cast("double"), 20, W) / 1e5)
      .drop("tp_arr")
  }

  /** Output factor column names, in declaration order. */
  val columns: Seq[String] = Seq(
    "ma_5", "ma_20", "ma_60", "bias_20", "bias_60", "boll_upper", "boll_lower",
    "rsi_14", "atr_14", "cci_14", "wr_14", "mfi_14", "vroc_20", "obv_slope_20",
    "vwap_bias_20", "psy_12", "ui_14", "amihud_20", "aroon_osc_25", "chop_14",
    "turnover_std_20")
}
