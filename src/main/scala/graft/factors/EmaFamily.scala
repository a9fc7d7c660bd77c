package graft.factors

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** The recursive EMA factor family of
  * `database/functions/basic factor_function.md:8-9,13,17,26-27`:
  * macd (diff/dea), kdj (k/d/j), trix_12, force_13 and the mass_25
  * ratio input — all pandas `ewm(adjust=False)` recursions, which are
  * not frame-expressible (SURVEY.md §7.3-1).
  *
  * Unlike [[graft.ops.TsOps.ema]] (one series per pass), this runs
  * EVERY chain in a single repartition(stock) + partition-local sort
  * + one streaming `mapPartitions` with O(1) state per stock: 11
  * recursive registers instead of 11 shuffles. The downstream
  * `mass_25` rolling sum reuses the same hash partitioning (no second
  * exchange).
  *
  * Pinned conventions (tested in EmaFamilySpec; mirrored stepwise by
  * the q43 recursive-CTE oracle):
  *  - ewm(adjust=False): y_1 = x_1, y_t = a*x_t + (1-a)*y_{t-1};
  *  - null input rows carry state (output = previous state, null if
  *    the series hasn't started) — only force_13's day-1 input is
  *    null on the Quotes panel;
  *  - spans: macd 12/26/9 (a = 2/(n+1)), kdj a = 1/3 (M1=3), trix
  *    span 12, force span 13, mass EMA span 9;
  *  - macd_diff = (EMA12 - EMA26) * 2 (the reference's scaling),
  *    macd_dea = EMA(diff, 9);
  *  - kdj: K = EMA(rsv, 1/3) with rsv = (C-L9)/(H9-L9)*100, D =
  *    EMA(K, 1/3), J = 3K - 2D;
  *  - trix_12 = (TEMA_t - TEMA_{t-1}) / TEMA_{t-1}, null on day 1;
  *  - mass_25 = rolling 25-sum of EMA(H-L,9)/EMA(EMA(H-L,9),9).
  */
object EmaFamily {

  // public: the q43 oracle re-derives the chains from these exact doubles
  val aMacdFast = 2.0 / 13
  val aMacdSlow = 2.0 / 27
  val aSignal = 2.0 / 10
  val aKdj = 1.0 / 3
  val aTrix = 2.0 / 13
  val aForce = 2.0 / 14
  val aMass = 2.0 / 10

  /** Adds macd_diff/macd_dea/kdj_k/kdj_d/kdj_j/trix_12/force_13/
    * mass_25 to a quotes panel keyed (stock, day).
    *
    * ONE exchange end-to-end (FactorPlanSpec pins it): the explicit
    * repartition+sort comes FIRST, the rsv/fin window pass then finds
    * its required distribution/order already satisfied (no second
    * exchange), and mass_25's rolling 25-sum runs inside the same
    * streaming pass via a ring buffer instead of a post-pass window
    * (mapPartitions erases partitioning info, so a window after it
    * would re-shuffle). */
  def compute(quotes: DataFrame): DataFrame = {
    val W = Window.partitionBy("stock").orderBy("day")
    def t(d: Int) = W.rowsBetween(-(d - 1), 0)
    val hh9 = max(col("high")).over(t(9))
    val ll9 = min(col("low")).over(t(9))

    val pre = quotes
      .repartition(col("stock"))
      .sortWithinPartitions("stock", "day")
      .withColumn("rsv",
        when(hh9 - ll9 =!= 0.0, (col("close") - ll9) / (hh9 - ll9) * 100.0))
      .withColumn("fin",
        (col("close") - lag(col("close"), 1).over(W)) * col("volume"))
      .withColumn("hl", col("high") - col("low"))

    val outSchema = StructType(pre.schema.fields ++ Seq(
      "macd_diff", "macd_dea", "kdj_k", "kdj_d", "kdj_j", "trix_12",
      "force_13", "mass_25").map(StructField(_, DoubleType, nullable = true)))
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    val iStock = pre.schema.fieldIndex("stock")
    val iClose = pre.schema.fieldIndex("close")
    val iRsv = pre.schema.fieldIndex("rsv")
    val iFin = pre.schema.fieldIndex("fin")
    val iHl = pre.schema.fieldIndex("hl")

    val withRec = pre
      .mapPartitions { rows =>
        var key: Any = null
        var started = false
        // NaN = series not started yet
        var e12, e26, dea, sK, sD, t1, t2, t3, sF, mHl, mHl2 = Double.NaN
        // ring buffer for the trailing-25 sum of the mass ratio
        val ring = new Array[Double](25)
        var ringN = 0
        var ringIdx = 0
        def ema(prev: Double, x: Double, a: Double): Double =
          if (prev.isNaN) x else a * x + (1 - a) * prev
        def orNull(x: Double): Any = if (x.isNaN) null else x
        rows.map { r =>
          val k = r.get(iStock)
          if (!started || k != key) {
            key = k; started = true
            e12 = Double.NaN; e26 = Double.NaN; dea = Double.NaN
            sK = Double.NaN; sD = Double.NaN
            t1 = Double.NaN; t2 = Double.NaN; t3 = Double.NaN
            sF = Double.NaN; mHl = Double.NaN; mHl2 = Double.NaN
            ringN = 0; ringIdx = 0
          }
          val close = r.getDouble(iClose)
          // macd chain
          e12 = ema(e12, close, aMacdFast)
          e26 = ema(e26, close, aMacdSlow)
          val diff = (e12 - e26) * 2.0
          dea = ema(dea, diff, aSignal)
          // kdj chain (carry state over null rsv)
          if (!r.isNullAt(iRsv)) {
            sK = ema(sK, r.getDouble(iRsv), aKdj)
            sD = ema(sD, sK, aKdj)
          }
          val j = if (sK.isNaN) null else 3.0 * sK - 2.0 * sD
          // trix chain: remember TEMA before this row's update
          val prevT3 = t3
          t1 = ema(t1, close, aTrix)
          t2 = ema(t2, t1, aTrix)
          t3 = ema(t3, t2, aTrix)
          val trix =
            if (prevT3.isNaN || prevT3 == 0.0) null else (t3 - prevT3) / prevT3
          // force chain (input null on day 1)
          if (!r.isNullAt(iFin)) sF = ema(sF, r.getDouble(iFin), aForce)
          // mass ratio chain + trailing-25 sum (oldest-first re-sum
          // matches the window frame-scan accumulation order)
          mHl = ema(mHl, r.getDouble(iHl), aMass)
          mHl2 = ema(mHl2, mHl, aMass)
          val mass: Any =
            if (mHl2 == 0.0) null
            else {
              if (ringN < 25) { ring(ringN) = mHl / mHl2; ringN += 1 }
              else { ring(ringIdx) = mHl / mHl2; ringIdx = (ringIdx + 1) % 25 }
              var s = 0.0
              var i = 0
              while (i < ringN) { s += ring((ringIdx + i) % 25); i += 1 }
              s
            }
          Row.fromSeq(r.toSeq ++ Seq(diff, dea, orNull(sK), orNull(sD), j,
            trix, orNull(sF), mass))
        }
      }

    withRec.drop("rsv", "fin", "hl")
  }

  /** Output factor column names. */
  val columns: Seq[String] = Seq(
    "macd_diff", "macd_dea", "kdj_k", "kdj_d", "kdj_j", "trix_12",
    "force_13", "mass_25")
}
