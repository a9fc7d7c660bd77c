package graft.factors

import graft.ops.TsOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Momentum factor corpus — `database/functions/basic
  * factor_function.md:36-46` / `database/ddl/factor_db_ddl.md:37-58`
  * (`factor_momentum_daily`): roc, volatility, turnover/amplitude
  * means, range position, momentum acceleration, rolling linear-
  * regression slope, volume ratio, return skew/kurtosis.
  *
  * Conventions (pinned, mirrored in the q44 oracle):
  *  - ret/roc are close-over-lagged-close ratios minus 1, null while
  *    the lag is undefined;
  *  - vr_26 classifies each day by close vs previous close; day 1
  *    (no previous) contributes to NO bucket;
  *  - linear_reg_slope_20 regresses close on the day index over the
  *    trailing 20-row frame (closed-form sums — exact doubles here);
  *  - skew_20/kurt_20 use Spark's population central-moment
  *    definitions: sqrt(n)*m3/m2^1.5 and n*m4/m2^2 - 3, null when
  *    m2 = 0.
  *
  * Scale: every factor is a window over the single stock-keyed hash
  * shuffle; no self-joins, no collect.
  */
object Momentum {

  private val W = Window.partitionBy("stock").orderBy("day")
  private def t(d: Int) = W.rowsBetween(-(d - 1), 0)

  private def div(num: Column, den: Column): Column =
    when(den =!= 0.0, num / den)

  def compute(quotes: DataFrame): DataFrame = {
    val prevC = lag(col("close"), 1).over(W)
    def roc(d: Int) = div(col("close"), lag(col("close"), d).over(W)) - lit(1.0)

    val base = quotes
      .withColumn("prev_c", prevC)
      .withColumn("ret", div(col("close"), prevC) - lit(1.0))
      .withColumn("roc_5", roc(5))
      .withColumn("roc_20", roc(20))
      .withColumn("roc_60", roc(60))
      .withColumn("amp", div(col("high") - col("low"), col("prev_c")))
      .withColumn("v_up",
        when(col("close") > col("prev_c"), col("volume").cast("double")).otherwise(0.0))
      .withColumn("v_dn",
        when(col("close") < col("prev_c"), col("volume").cast("double")).otherwise(0.0))
      .withColumn("v_fl",
        when(col("close") === col("prev_c"), col("volume").cast("double")).otherwise(0.0))

    // rolling OLS slope of close on the day index, closed form
    val dd = col("day").cast("double")
    val f20 = t(20)
    val n = count(lit(1)).over(f20).cast("double")
    val st = sum(dd).over(f20)
    val sy = sum(col("close")).over(f20)
    val stt = sum(dd * dd).over(f20)
    val sty = sum(dd * col("close")).over(f20)
    val slope = div(n * sty - st * sy, n * stt - st * st)

    val f26 = t(26)
    val vr = div(
      sum(col("v_up")).over(f26) + lit(0.5) * sum(col("v_fl")).over(f26),
      sum(col("v_dn")).over(f26) + lit(0.5) * sum(col("v_fl")).over(f26))

    base
      // volatility_20 rides the SAME staged list fold as skew/kurt
      // (see the withSkewKurt call below): ret is an inexact quotient,
      // so the closed-form power sums are order-dependent and only a
      // sequential fold replays on both engines — stddevName attaches
      // sqrt(c2/(n-1)) off the shared staged c2
      .withColumn("turnover_mean_5", TsOps.tsMean(col("turnover"), 5, W))
      .withColumn("amplitude_mean_5", TsOps.tsMean(col("amp"), 5, W))
      .withColumn("pos_20", div(col("close") - TsOps.tsMin(col("low"), 20, W),
        TsOps.tsMax(col("high"), 20, W) - TsOps.tsMin(col("low"), 20, W)))
      .withColumn("pos_60", div(col("close") - TsOps.tsMin(col("low"), 60, W),
        TsOps.tsMax(col("high"), 60, W) - TsOps.tsMin(col("low"), 60, W)))
      .withColumn("mom_acc_5", col("roc_5") - lag(col("roc_5"), 5).over(W))
      .withColumn("linear_reg_slope_20", slope)
      .withColumn("vr_26", vr)
      .transform(TsOps.withSkewKurt(_, col("ret"), 20, W, "skew_20", "kurt_20",
        stddevName = Some("volatility_20")))
  }

  /** Output factor column names (factor_momentum_daily order). */
  val columns: Seq[String] = Seq(
    "roc_5", "roc_20", "roc_60", "volatility_20", "turnover_mean_5",
    "amplitude_mean_5", "pos_20", "pos_60", "mom_acc_5",
    "linear_reg_slope_20", "vr_26", "skew_20", "kurt_20")
}
