package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Time-series (rolling, per-entity) operator kernel.
  *
  * Re-expresses the reference's rolling operator library
  * (`database/functions/alpha101_engine.py:17-84`, see SURVEY.md §2.5) as
  * Spark window expressions. The time axis is row-based (trading
  * days / event sequence), so every frame is `rowsBetween`, never
  * `rangeBetween` (SURVEY.md §7.3-4: ragged calendars).
  *
  * Usage: `val w = Window.partitionBy("code").orderBy("date", "id")`
  * then `TsOps.delta(col("close"), 5, w)`. All operators are pure
  * Column expressions (codegen-friendly, no UDFs) except [[ema]],
  * which is inherently recursive (SURVEY.md §7.2) and runs as a
  * sorted per-partition pass.
  *
  * Conventions (pinned; see TsOpsSpec):
  *  - trailing frame of `d` rows INCLUDING the current row;
  *  - [[tsArgMax]]/[[tsArgMin]] return "rows since the OLDEST
  *    occurrence of the extremum" (0 = current row is the unique max,
  *    d-1 = extremum at window start) matching the reference report's
  *    "days since max" reading (`Project report.md:676`);
  *  - [[tsRank]] = (# window values <= current) / (window size), in
  *    (0, 1]; ties count fully (ordinal-"max" convention).
  */
object TsOps {

  /** Trailing row frame of length d ending at the current row. */
  def trailing(w: WindowSpec, d: Int): WindowSpec = w.rowsBetween(-(d - 1), 0)

  /** delay(x, d): value d rows ago (alpha101_engine.py:17-20). */
  def delay(x: Column, d: Int, w: WindowSpec): Column = lag(x, d).over(w)

  /** delta(x, d): x - delay(x, d) (alpha101_engine.py:22-25). */
  def delta(x: Column, d: Int, w: WindowSpec): Column = x - lag(x, d).over(w)

  /** Rolling sum over d rows (alpha101_engine.py:64-67). */
  def tsSum(x: Column, d: Int, w: WindowSpec): Column = sum(x).over(trailing(w, d))

  /** Rolling mean over d rows (the alpha corpus's `adv{d}` shape). */
  def tsMean(x: Column, d: Int, w: WindowSpec): Column = avg(x).over(trailing(w, d))

  /** Rolling min/max over d rows (alpha101_engine.py:37-45). */
  def tsMin(x: Column, d: Int, w: WindowSpec): Column = min(x).over(trailing(w, d))
  def tsMax(x: Column, d: Int, w: WindowSpec): Column = max(x).over(trailing(w, d))

  /** Rolling sample stddev in CLOSED FORM from power sums:
    * `sqrt((n·Σx² − (Σx)²) / (n(n−1)))`. For exact-grain inputs
    * (the panel's 1/64-multiples, integer volumes) both window sums
    * are EXACT doubles — order-independent, so Spark's frame-scan and
    * DuckDB's segment-tree accumulate to the same bits and the rest
    * is identical-association arithmetic: engine-proof parity, where
    * the built-in stddev_samp's incremental moments are
    * engine-specific (the q44 skew class; Alpha101.tsStdCf is the
    * same construction). NULL at n ≤ 1, matching stddev_samp. Do NOT
    * use on inexact inputs (quotients): their power sums are
    * order-dependent again — go through the staged list fold
    * ([[withSkewKurt]]) instead. */
  def tsStddevCf(x: Column, d: Int, w: WindowSpec): Column =
    moments(x, d, w, needCentral = false, needCf = true).getField("stddev_cf")

  /** Rolling sample stddev over d rows (alpha101_engine.py:74-77). */
  def tsStddev(x: Column, d: Int, w: WindowSpec): Column =
    stddev_samp(x).over(trailing(w, d))

  /** Rolling Pearson correlation (alpha101_engine.py:27-30). */
  def tsCorr(x: Column, y: Column, d: Int, w: WindowSpec): Column =
    corr(x, y).over(trailing(w, d))

  /** Rolling sample covariance (alpha101_engine.py:32-35). */
  def tsCovar(x: Column, y: Column, d: Int, w: WindowSpec): Column =
    covar_samp(x, y).over(trailing(w, d))

  /** Rolling population skewness / kurtosis (basic
    * factor_function.md: skew_20/kurt_20) — computed as an explicit
    * TWO-PASS fold over the collected window (mean, then left-to-
    * right central-moment sums), NOT the built-in skewness/kurtosis
    * aggregates: those update their moments incrementally per row, an
    * accumulation the q44 oracle's two-pass list replay cannot
    * reproduce bitwise — at sf0.1 depth the drift crossed the 6-dp
    * quantization boundary on 4 of 100k rows (r15 latent-divergence
    * hunt). The fold form IS the oracle's association, so parity is
    * by construction; nulls are absent from the collected window on
    * both engines (collect_list skips them, the oracle list_filters).
    * Formulae: g1 = √n·c3/c2^1.5, g2 = n·c4/c2² − 3 (population;
    * NULL for a zero-variance window). */
  def tsSkew(x: Column, d: Int, w: WindowSpec): Column =
    moments(x, d, w, needCentral = true, needCf = false).getField("skew")
  def tsKurt(x: Column, d: Int, w: WindowSpec): Column =
    moments(x, d, w, needCentral = true, needCf = false).getField("kurt")

  /** The shared moment kernel behind [[tsSkew]]/[[tsKurt]]/
    * [[withSkewKurt]]/[[tsStddevCf]]: ONE
    * [[graft.expressions.MomentsFold]] window aggregate buffering the
    * frame as primitive doubles and evaluating every moment with the
    * exact sequential-fold association of the r15 staged
    * `collect_list` forms (values pinned in MomentsFoldSpec) — the
    * boxed per-row array column and its 4× lambda re-folds are gone
    * (r15 verdict, What's-wrong #3). */
  private def moments(x: Column, d: Int, w: WindowSpec,
      needCentral: Boolean, needCf: Boolean): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.MomentsFold(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(x),
        needCentral = needCentral, needCf = needCf)
        .toAggregateExpression())
      .over(trailing(w, d))

  /** [[tsSkew]] + [[tsKurt]] (+ optional fold-form sample stddev, the
    * inexact-input replacement for the built-in) off ONE
    * [[moments]] aggregate, materialized once and field-extracted.
    * Same formulas, same null/zero-variance conventions as the
    * single-Column forms. */
  def withSkewKurt(df: DataFrame, x: Column, d: Int, w: WindowSpec,
      skewName: String, kurtName: String,
      stddevName: Option[String] = None): DataFrame = {
    val t = "_sk_moments"
    df.withColumn(t, moments(x, d, w, needCentral = true, needCf = false))
      .withColumn(skewName, col(t).getField("skew"))
      .withColumn(kurtName, col(t).getField("kurt"))
      .transform(d0 => stddevName.fold(d0)(sn =>
        d0.withColumn(sn, col(t).getField("stddev_fold"))))
      .drop(t)
  }

  /** Native-fold Column wrappers (r20): the factor tier's per-row
    * array kernels go through [[graft.expressions]] folds instead of
    * HOF lambdas (interpreted per element — see ArrayFolds.scala's
    * bit-exactness contract). */
  private[graft] def bridged1(f: org.apache.spark.sql.catalyst.expressions.Expression =>
      org.apache.spark.sql.catalyst.expressions.Expression)(a: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      f(org.apache.spark.sql.graftbridge.ColumnBridge.expression(a)))
  private[graft] def bridged2(f: (org.apache.spark.sql.catalyst.expressions.Expression,
      org.apache.spark.sql.catalyst.expressions.Expression) =>
      org.apache.spark.sql.catalyst.expressions.Expression)(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      f(org.apache.spark.sql.graftbridge.ColumnBridge.expression(a),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(b)))

  /** Rolling product, exact (alpha101_engine.py:69-72 uses exp(Σlog);
    * we multiply directly via a fold so sign/zero are handled).
    * NOTE: unlike [[graft.factors.Alpha101]]'s tsProd there is no
    * empty-array guard — an all-null window folds to the 1.0 start
    * value, the pinned q162 convention. */
  def tsProduct(x: Column, d: Int, w: WindowSpec): Column = {
    val arr = collect_list(x).over(trailing(w, d))
    aggregate(arr, lit(1.0), (acc, v) => acc * v)
  }

  // ---- array-form kernels -------------------------------------------
  // The SQL-function surface (graft_ts_rank / graft_ts_argmax /
  // graft_decay_linear, GraftFunctions) applies these to a
  // `collect_list(x) OVER w` array built in SQL text; the WindowSpec
  // forms below DELEGATE to them, so the two surfaces are the same
  // Catalyst subtree by construction — parity pinned in
  // GraftFunctionsSpec, and any tie/null-convention fix lands on both
  // at once.

  /** Rows since the oldest occurrence of the array max. */
  def tsArgMaxArr(arr: Column): Column =
    (size(arr) - array_position(arr, array_max(arr))).cast(DoubleType)

  /** Rank of the LAST element within its array, in (0,1] — one
    * native pass ([[graft.expressions.TsRankLeFold]], r20; was
    * `size(filter(arr, v <= last)) / size(arr)`). */
  def tsRankArr(arr: Column): Column =
    bridged1(graft.expressions.TsRankLeFold.apply)(arr)

  /** Linear-decay weighted mean of the array: weights 1..n, last
    * element (the newest row in window form) weight n. One native
    * fold ([[graft.expressions.DecayLinearFold]], r20; was the
    * `aggregate(zip_with(...))` HOF chain — bit-identical by the
    * fold's association contract). */
  def decayLinearArr(arr: Column): Column =
    bridged1(graft.expressions.DecayLinearFold(_, nullSlot = false))(arr)

  /** Rows since the oldest occurrence of the window max
    * (alpha101_engine.py:47-50; convention pinned in the scaladoc). */
  def tsArgMax(x: Column, d: Int, w: WindowSpec): Column =
    tsArgMaxArr(collect_list(x).over(trailing(w, d)))

  /** Rows since the oldest occurrence of the window min
    * (alpha101_engine.py:52-55). */
  def tsArgMin(x: Column, d: Int, w: WindowSpec): Column = {
    val arr = collect_list(x).over(trailing(w, d))
    (size(arr) - array_position(arr, array_min(arr))).cast(DoubleType)
  }

  /** Rank of the current value within its trailing window, in (0,1]
    * (alpha101_engine.py:57-62; convention pinned in the scaladoc). */
  def tsRank(x: Column, d: Int, w: WindowSpec): Column =
    tsRankArr(collect_list(x).over(trailing(w, d)))

  /** Linear-decay weighted mean: weights 1..n, newest row weight n
    * (alpha101_engine.py:79-84). */
  def decayLinear(x: Column, d: Int, w: WindowSpec): Column =
    decayLinearArr(collect_list(x).over(trailing(w, d)))

  /** Running (unbounded-preceding) sum — cumulative series. */
  def cumSum(x: Column, w: WindowSpec): Column =
    sum(x).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))

  /** Cumulative product via the log trick for positive series
    * (`pages/6_Sector rotation.py:154` equity curve). */
  def cumProdPositive(x: Column, w: WindowSpec): Column =
    exp(sum(log(x)).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))

  /** Exponential moving average, recursive pandas `ewm(span, adjust=false)`
    * semantics: y_0 = x_0; y_t = alpha*x_t + (1-alpha)*y_{t-1}.
    *
    * Not frame-expressible (SURVEY.md §7.3-1). Implementation: hash-
    * repartition by key, sort each partition by (key, order), one
    * streaming pass with O(1) state per key. Scales: no per-group
    * materialization, partition count = shuffle parallelism.
    *
    * @param orderCols must totally order rows within a key.
    */
  def ema(df: DataFrame, keyCol: String, orderCols: Seq[String],
          valueCol: String, alpha: Double, outCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, DoubleType, nullable = true))
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    val keyIdx = df.schema.fieldIndex(keyCol)
    val valIdx = df.schema.fieldIndex(valueCol)
    df.repartition(col(keyCol))
      .sortWithinPartitions((keyCol +: orderCols).map(col): _*)
      .mapPartitions { rows =>
        var curKey: Any = null
        var started = false
        var state = 0.0
        rows.map { r =>
          val k = r.get(keyIdx)
          if (!started || k != curKey) { curKey = k; started = true; state = Double.NaN }
          val out: Any =
            if (r.isNullAt(valIdx)) { if (state.isNaN) null else state }
            else {
              val x = r.getDouble(valIdx)
              state = if (state.isNaN) x else alpha * x + (1 - alpha) * state
              state
            }
          Row.fromSeq(r.toSeq :+ out)
        }
      }
  }
}
