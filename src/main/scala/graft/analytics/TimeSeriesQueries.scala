package graft.analytics

import graft.Tables
import graft.ops.{TsOps, XsOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Plane-B operator-kernel queries (SURVEY.md §2.5): the rolling /
  * cross-sectional factor primitives applied to the `events` table
  * (user_id = entity axis, event_id = deterministic time axis).
  *
  * Ordering convention: within a user, rows are ordered by
  * `event_id` alone — it is unique and monotone with `ts`, and using
  * it avoids Spark(µs)-vs-DuckDB(ns) timestamp truncation skew in
  * the oracle compare.
  *
  * Scale: every query is a window over `partitionBy(user_id)` — one
  * hash shuffle on the entity key, then purely partition-local sorts;
  * this is the same plan shape at 100 TB (shuffle keyed on a
  * high-cardinality entity id, no global sort, no collect).
  */
object TimeSeriesQueries {
  private type Q = (SparkSession, String) => DataFrame

  private def w = Window.partitionBy("user_id").orderBy("event_id")

  /** delay/delta (alpha101_engine.py:17-25). Value grain is 0.01 so
    * round(·,2) is exact in both engines. */
  def tsLagDelta: Q = (s, dir) => {
    val e = Tables.load(s, dir, "events")
    e.select(col("user_id"), col("event_id"), col("value"),
        round(TsOps.delay(col("value"), 1, w), 2).as("lag1"),
        round(TsOps.delta(col("value"), 1, w), 2).as("delta1"),
        round(TsOps.delta(col("value"), 3, w), 2).as("delta3"))
      .orderBy("user_id", "event_id")
  }

  /** Rolling sum/mean/min/max/stddev over a 5-row trailing frame
    * (alpha101_engine.py:37-45, 64-77). */
  def tsRolling: Q = (s, dir) => {
    val e = Tables.load(s, dir, "events")
    e.select(col("user_id"), col("event_id"),
        round(TsOps.tsSum(col("value"), 5, w), 2).as("roll_sum5"),
        round(TsOps.tsMean(col("value"), 5, w), 6).as("roll_mean5"),
        round(TsOps.tsMin(col("value"), 5, w), 2).as("roll_min5"),
        round(TsOps.tsMax(col("value"), 5, w), 2).as("roll_max5"),
        round(TsOps.tsStddev(col("value"), 5, w), 6).as("roll_std5"))
      .orderBy("user_id", "event_id")
  }

  /** Rolling Pearson correlation vs a second deterministic series
    * (alpha101_engine.py:27-30). Both sides compute the same
    * closed-form sums formula, so the oracle is engine-independent. */
  def tsCorrRolling: Q = (s, dir) => {
    val e = Tables.load(s, dir, "events")
    val f = w.rowsBetween(-9, 0)
    val x = col("value")
    val y = col("event_id").cast("double")
    val n = count(lit(1)).over(f).cast("double")
    val sx = sum(x).over(f); val sy = sum(y).over(f)
    val sxx = sum(x * x).over(f); val syy = sum(y * y).over(f)
    val sxy = sum(x * y).over(f)
    val num = n * sxy - sx * sy
    val den = sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)
    e.select(col("user_id"), col("event_id"),
        round(when(den > 0, num / den), 6).as("trend_corr10"))
      .orderBy("user_id", "event_id")
  }

  /** ts_argmax / ts_argmin / ts_rank / decay_linear / product over a
    * 5-row frame (alpha101_engine.py:47-62, 69-72, 79-84) — the
    * collect_list+HOF kernel path. */
  def tsArgmaxRankDecay: Q = (s, dir) => {
    val e = Tables.load(s, dir, "events")
    e.select(col("user_id"), col("event_id"),
        TsOps.tsArgMax(col("value"), 5, w).as("argmax5"),
        TsOps.tsArgMin(col("value"), 5, w).as("argmin5"),
        round(TsOps.tsRank(col("value"), 5, w), 6).as("tsrank5"),
        round(TsOps.decayLinear(col("value"), 5, w), 4).as("decay5"),
        // rolling product (W9) on a bounded factor so the 5-term
        // product stays in round-6 range
        round(TsOps.tsProduct(lit(1.0) + col("value") / 1000.0, 5, w), 6)
          .as("roll_prod5"))
      .orderBy("user_id", "event_id")
  }

  /** Cross-sectional kernel (alpha101_engine.py:90-112): pandas-tie
    * percentile rank, z-score, scale, demean — partitioned by
    * event_type (the "trading day" axis of this dataset). */
  def xsRankScale: Q = (s, dir) => {
    val e = Tables.load(s, dir, "events")
    val part = col("event_type")
    e.select(col("event_type"), col("event_id"),
        round(XsOps.rankPctBy(col("value"), part), 6).as("rank_pct"),
        round(XsOps.zscore(col("value"), part), 6).as("zscore"),
        round(XsOps.scale(col("value"), 1.0, part), 8).as("scaled"),
        round(XsOps.demean(col("value"), part), 6).as("demeaned"))
      .orderBy("event_type", "event_id")
  }

  /** Tumbling-window event-time aggregation (batch form of the
    * streaming plan, SURVEY.md §2.10): date_trunc → group. */
  def eventHourly: Q = (s, dir) => {
    val e = Tables.load(s, dir, "events")
    e.groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"),
        countDistinct("user_id").as("n_users"))
      .orderBy("hour", "event_type")
  }

  /** Recursive EMA (pandas ewm adjust=False). The oracle replays the
    * recursion stepwise with a recursive CTE walking each user's
    * row_number chain, in the SAME association order as
    * [[graft.ops.TsOps.ema]] — identical double ops on identical
    * parquet doubles, so values match bitwise before quantization
    * (the q95 oracle shape; robust to testdata regeneration, unlike
    * the closed-form pow expansion it replaces). */
  def emaSeries: Q = (s, dir) => {
    val e = Tables.load(s, dir, "events")
      .select("user_id", "event_id", "value")
    // floor-based 6-dp quantization (identical double ops in the
    // oracle text): engine round() implementations disagree on
    // boundary representations, floor(x*1e6+0.5)/1e6 cannot
    TsOps.ema(e, "user_id", Seq("event_id"), "value", alpha = 0.2, outCol = "ema")
      .select(col("user_id"), col("event_id"),
        (floor(col("ema") * 1e6 + lit(0.5)) / 1e6).as("ema"))
      .orderBy("user_id", "event_id")
  }

  /** q97: AS-OF join — every daily panel row picks up the latest
    * fundamental snapshot known at-or-before its day (snapshots every
    * 5th day, starting day 6 so days 1-5 exercise the null/LEFT-OUTER
    * path and day 6 the time-tie path). [[graft.ops.AsOfOps.asOfJoin]]
    * composes it as union → one key shuffle → running last-non-null
    * window; the oracle is DuckDB's NATIVE `ASOF LEFT JOIN`, so the
    * semantics are pinned against an independent implementation. */
  def asOfJoinEntry: Q = (s, dir) => {
    val q = graft.sources.Quotes.panel(s, dir)
    val left = q.select(col("stock"), col("day"), round(col("close"), 6).as("close"))
    val right = q.filter(col("day") % 5 === 1 && col("day") > 1)
      .select(col("stock"), col("day").as("f_day"), col("pe").as("f_pe"))
    graft.ops.AsOfOps.asOfJoin(left, right, keys = Seq("stock"),
        leftTime = "day", rightTime = "f_day", payload = Seq("f_day", "f_pe"))
      .orderBy("stock", "day")
  }

  /** q98/q101: OHLCV bar resampling, daily → N-day bars (5 = weekly,
    * 21 = monthly in trading days) — the kline downsampling surface
    * every quote store serves (`QuantDB.py` kline periods). Ordered
    * first/last inside a group without a window pass: `min_by(open,
    * day)` / `max_by(close, day)` run as ONE hash aggregation with
    * map-side partials — at 100 TB this is a single shuffle keyed
    * (stock, bar), no per-group sort at all. `amount` sums are exact:
    * the panel's amount is a multiple of 1/256, so accumulation order
    * can't change the result; the displayed value is floor-quantized
    * (`fr6`) because engine round() disagrees on exact halves. */
  def ohlcResample(period: Int): Q = (s, dir) => {
    val q = graft.sources.Quotes.panel(s, dir)
    q.groupBy(col("stock"), ((col("day") - 1) / lit(period.toLong)).cast("bigint").as("bar"))
      .agg(
        min_by(col("open"), col("day")).as("open"),
        max(col("high")).as("high"),
        min(col("low")).as("low"),
        max_by(col("close"), col("day")).as("close"),
        sum(col("volume")).as("volume"),
        (floor(sum(col("amount")) * 1e6 + lit(0.5)) / 1e6).as("amount"),
        count(lit(1)).as("n_days"))
      .orderBy("stock", "bar")
  }

  private def ohlcOracle(period: Int): String =
    s"""WITH ${graft.sources.Quotes.sqlCte}
       |SELECT stock, CAST((day - 1) // $period AS BIGINT) AS bar,
       | min_by(open, day) AS open,
       | max(high) AS high,
       | min(low) AS low,
       | max_by(close, day) AS close,
       | CAST(sum(volume) AS BIGINT) AS volume,
       | floor(sum(amount) * 1e6 + 0.5) / 1e6 AS amount,
       | count(*) AS n_days
       |FROM quotes
       |GROUP BY 1, 2
       |ORDER BY stock, bar""".stripMargin

  /** q115 body, shared VERBATIM by both engines: the Spark side runs
    * `WITH <body>` through `spark.sql` over [[graft.Tables.registerAll]]'s
    * views; the oracle prepends the quotes CTE and runs the identical
    * text in DuckDB. Everything in it is order-independent (min/max/
    * counts over exact doubles), so no fr6 beyond the output guard. */
  private val sqlSurfaceBody: String =
    """m AS (
      |  SELECT stock, day, close,
      |    max(close) OVER (PARTITION BY stock ORDER BY day
      |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS hi20,
      |    min(close) OVER (PARTITION BY stock ORDER BY day
      |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS lo20
      |  FROM quotes)
      |SELECT stock,
      |  count(*) AS n_days,
      |  CAST(sum(CASE WHEN close >= hi20 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_breakout,
      |  CAST(sum(CASE WHEN close <= lo20 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_breakdown,
      |  floor(max(hi20 - lo20) * 1e6 + 0.5) / 1e6 AS max_range20
      |FROM m
      |GROUP BY stock
      |HAVING count(*) >= 60
      |ORDER BY stock""".stripMargin

  /** q115: the SQL-string console surface — the reference's ONLY
    * access path is synthesized SQL text sent to ClickHouse
    * (`QuantDB.py:158-179`), so the library proves the same text-in,
    * DataFrame-out path: `spark.sql` over the registered catalog
    * views, running a rolling-breakout screen (20-day channel) that
    * is the same SQL string the DuckDB oracle executes. Catalyst
    * plans it identically to the DataFrame API: one stock-keyed
    * exchange feeding both frame windows, then the grouped agg. */
  def sqlSurface: Q = (s, dir) => {
    Tables.registerAll(s, dir)
    s.sql(s"WITH $sqlSurfaceBody")
  }

  /** q162 SQL body, shared between the Spark surface and the DuckDB
    * oracle with the per-engine snippets injected: the array builder
    * (`collect_list` vs `list`) and the three graft named functions
    * (which the oracle replays as list lambdas — q23's conventions).
    * Everything else is IDENTICAL text, so association order —
    * window sums, the alpha product, the quantization — matches op
    * for op. Float discipline: the momentum axis uses price DELTAS
    * (exact 1/64-grain doubles whose window sums are
    * order-independent) instead of return quotients — a windowed sum
    * of inexact quotients would hash-diverge on DuckDB's
    * segment-tree accumulation order. */
  private def quantSqlBody(list: String, tsRankC8: String, argmaxC10: String,
      decayVw9: String, tsRankV5: String): String =
    s"""r AS (
       | SELECT stock, day, close, low, volume, vwap,
       |  close - lag(close) OVER (PARTITION BY stock ORDER BY day) AS d1
       | FROM quotes),
       |arrs AS (
       | SELECT stock, day,
       |  $list(close) OVER w8 AS c8,
       |  $list(close) OVER w10 AS c10,
       |  $list(vwap) OVER w9 AS vw9,
       |  $list(volume) OVER w5 AS v5,
       |  min(low) OVER w5 AS minlow5,
       |  sum(d1) OVER w240 AS sd240,
       |  sum(d1) OVER w20 AS sd20
       | FROM r
       | WINDOW
       |  w5 AS (PARTITION BY stock ORDER BY day ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
       |  w8 AS (PARTITION BY stock ORDER BY day ROWS BETWEEN 7 PRECEDING AND CURRENT ROW),
       |  w9 AS (PARTITION BY stock ORDER BY day ROWS BETWEEN 8 PRECEDING AND CURRENT ROW),
       |  w10 AS (PARTITION BY stock ORDER BY day ROWS BETWEEN 9 PRECEDING AND CURRENT ROW),
       |  w20 AS (PARTITION BY stock ORDER BY day ROWS BETWEEN 19 PRECEDING AND CURRENT ROW),
       |  w240 AS (PARTITION BY stock ORDER BY day ROWS BETWEEN 239 PRECEDING AND CURRENT ROW)),
       |lagd AS (
       | SELECT *,
       |  lag(minlow5, 5) OVER (PARTITION BY stock ORDER BY day) AS minlow5l,
       |  (sd240 - sd20) / 220.0 AS rx
       | FROM arrs),
       |xrk AS (
       | SELECT *, CASE WHEN rx IS NOT NULL THEN
       |   (CAST(rank() OVER (PARTITION BY day ORDER BY rx NULLS LAST) AS DOUBLE)
       |    + (CAST(count(*) OVER (PARTITION BY day, rx) AS DOUBLE) - 1) / 2.0)
       |   / CAST(count(rx) OVER (PARTITION BY day) AS DOUBLE) END AS r52
       | FROM lagd)
       |SELECT stock, day,
       | round($tsRankC8, 6) AS tsrank_c8,
       | $argmaxC10 AS argmax_c10,
       | -- house floor-form quantization (the r6/alpha52 convention):
       | -- decay_vw9 is a vwap-weighted mean — an inexact quotient — and
       | -- round(x, 4) HALF_UPs on the shortest-decimal repr in Spark but
       | -- scale-by-1e4 rounds in DuckDB, diverging on exact 4-dp halves.
       | floor(($decayVw9) * 1e4 + 0.5) / 1e4 AS decay_vw9,
       | -- the injected snippet is parenthesized: an unparenthesized
       | -- a/b replay would re-associate the product (x*a/b vs x*(a/b))
       | -- and drift one ulp across the floor boundary
       | floor((-minlow5 + minlow5l) * r52 * ($tsRankV5) * 1e6 + 0.5) / 1e6
       |   AS alpha52
       |FROM xrk ORDER BY stock, day""".stripMargin

  /** q162: the QUANT tier as named SQL functions (r13 ask #6) — the
    * §2.5 w-ops `graft_ts_rank` / `graft_ts_argmax` /
    * `graft_decay_linear` run from pure SQL TEXT over a
    * `collect_list(...) OVER w` array, and an Alpha formula
    * (Kakushadze #52, the panel's exact-arithmetic momentum
    * convention, average-tie pct cross-rank) evaluates end-to-end in
    * that text — the reference's console user writes alphas without
    * touching the DataFrame API. The named functions return the SAME
    * Catalyst subtrees as [[graft.ops.TsOps]]'s window helpers
    * (delegation pinned in GraftFunctionsSpec), so this plans
    * identically to the factor engine: one stock-keyed exchange
    * serves every trailing window, one day-keyed exchange the cross
    * ranks. */
  def quantSqlFunctions: Q = (s, dir) => {
    Tables.registerAll(s, dir)
    graft.functions.GraftFunctions.register(s)
    s.sql("WITH " + quantSqlBody("collect_list",
      "graft_ts_rank(c8)", "graft_ts_argmax(c10)",
      "graft_decay_linear(vw9)", "graft_ts_rank(v5)"))
  }

  val entries: Map[String, Q] = Map(
    "q115_sql_surface" -> sqlSurface,
    "q162_quant_sql" -> quantSqlFunctions,
    "q97_asof_join" -> asOfJoinEntry,
    "q98_ohlc_resample" -> ohlcResample(5),
    "q101_ohlc_monthly" -> ohlcResample(21),
    "q20_ts_lag_delta" -> tsLagDelta,
    "q21_ts_rolling" -> tsRolling,
    "q22_ts_corr_rolling" -> tsCorrRolling,
    "q23_ts_argmax_rank_decay" -> tsArgmaxRankDecay,
    "q24_xs_rank_scale" -> xsRankScale,
    "q25_event_hourly" -> eventHourly,
    "q26_ema_series" -> emaSeries,
  )

  val oracles: Map[String, String] = Map(
    "q115_sql_surface" ->
      s"""WITH ${graft.sources.Quotes.sqlCte},
         |$sqlSurfaceBody""".stripMargin,
    // q162: identical body text; the graft named functions replayed as
    // DuckDB list lambdas in the exact q23 conventions (filter-count
    // rank, indexof argmax, (x,i)-weighted decay)
    "q162_quant_sql" -> {
      def tsRank(a: String) =
        s"CAST(len(list_filter($a, x -> x <= $a[-1])) AS DOUBLE)" +
          s" / CAST(len($a) AS DOUBLE)"
      s"WITH ${graft.sources.Quotes.sqlCte},\n" + quantSqlBody("list",
        tsRank("c8"),
        "CAST(len(c10) - list_indexof(c10, list_aggregate(c10, 'max')) AS DOUBLE)",
        "list_sum(list_transform(vw9, (x, i) -> x * i))" +
          " / (len(vw9) * (len(vw9) + 1) / 2.0)",
        tsRank("v5"))
    },
    "q97_asof_join" ->
      s"""WITH ${graft.sources.Quotes.sqlCte},
         |l AS (SELECT stock, day, round(close, 6) + 0.0 AS close FROM quotes),
         |r AS (SELECT stock, day AS f_day, pe AS f_pe FROM quotes
         |      WHERE day % 5 = 1 AND day > 1)
         |SELECT l.stock, l.day, l.close, r.f_day, r.f_pe
         |FROM l ASOF LEFT JOIN r
         |  ON l.stock = r.stock AND l.day >= r.f_day
         |ORDER BY l.stock, l.day""".stripMargin,
    "q98_ohlc_resample" -> ohlcOracle(5),
    "q101_ohlc_monthly" -> ohlcOracle(21),
    // stepwise recursive-CTE replay (the q95 oracle shape): literals
    // in the SAME association order as TsOps.ema's
    // `alpha * x + (1 - alpha) * state` — identical double ops on
    // identical inputs, so values match bitwise before the rounding.
    // (The previous closed-form pow(0.8,rn) expansion held only while
    // no value landed within ~1e-13 of a 6-dp round boundary — a
    // testdata regeneration hazard.)
    // the complement literal is computed HERE in binary (`1 - 0.2`,
    // the exact double TsOps.ema multiplies by): writing `(1 - 0.2)`
    // in the SQL text lets DuckDB subtract in exact DECIMAL
    // arithmetic, whose re-binarized 0.8 sits ONE ULP ABOVE the
    // binary difference — a latent per-step drift of the q43 force_13
    // class (caught at sf0.1, r15)
    "q26_ema_series" ->
      s"""WITH RECURSIVE t AS (
        | SELECT user_id, event_id, value,
        |  row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
        | FROM events),
        |rec AS (
        | SELECT user_id, event_id, rn, value AS ema FROM t WHERE rn = 1
        | UNION ALL
        | SELECT t.user_id, t.event_id, t.rn,
        |  0.2 * t.value + ${1 - 0.2} * rec.ema
        | FROM rec JOIN t ON t.user_id = rec.user_id AND t.rn = rec.rn + 1)
        |SELECT user_id, event_id, floor(ema * 1e6 + 0.5) / 1e6 AS ema
        |FROM rec ORDER BY user_id, event_id""".stripMargin,
    "q20_ts_lag_delta" ->
      """SELECT user_id, event_id, value,
        | round(lag(value, 1) OVER w, 2) AS lag1,
        | round(value - lag(value, 1) OVER w, 2) AS delta1,
        | round(value - lag(value, 3) OVER w, 2) AS delta3
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        |ORDER BY user_id, event_id""".stripMargin,
    "q21_ts_rolling" ->
      """SELECT user_id, event_id,
        | round(sum(value) OVER w, 2) AS roll_sum5,
        | round(avg(value) OVER w, 6) AS roll_mean5,
        | round(min(value) OVER w, 2) AS roll_min5,
        | round(max(value) OVER w, 2) AS roll_max5,
        | round(stddev_samp(value) OVER w, 6) AS roll_std5
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        |             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,
    "q22_ts_corr_rolling" ->
      """WITH t AS (
        | SELECT user_id, event_id,
        |  CAST(count(*) OVER w AS DOUBLE) AS n,
        |  sum(value) OVER w AS sx, sum(CAST(event_id AS DOUBLE)) OVER w AS sy,
        |  sum(value * value) OVER w AS sxx,
        |  sum(CAST(event_id AS DOUBLE) * CAST(event_id AS DOUBLE)) OVER w AS syy,
        |  sum(value * CAST(event_id AS DOUBLE)) OVER w AS sxy
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        |              ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id,
        | round(CASE WHEN sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy) > 0
        |   THEN (n*sxy - sx*sy) / (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy))
        |   END, 6) AS trend_corr10
        |FROM t ORDER BY user_id, event_id""".stripMargin,
    "q23_ts_argmax_rank_decay" ->
      """WITH t AS (
        | SELECT user_id, event_id, value, list(value) OVER w AS l
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        |              ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id,
        | CAST(len(l) - list_indexof(l, list_aggregate(l, 'max')) AS DOUBLE) AS argmax5,
        | CAST(len(l) - list_indexof(l, list_aggregate(l, 'min')) AS DOUBLE) AS argmin5,
        | round(CAST(len(list_filter(l, x -> x <= value)) AS DOUBLE) / len(l), 6) AS tsrank5,
        | round(list_sum(list_transform(l, (x, i) -> x * i))
        |   / (len(l) * (len(l) + 1) / 2.0), 4) AS decay5,
        | round(list_product(list_transform(l, x -> 1.0 + x / 1000.0)), 6)
        |   AS roll_prod5
        |FROM t ORDER BY user_id, event_id""".stripMargin,
    "q24_xs_rank_scale" ->
      """SELECT event_type, event_id,
        | round((rank() OVER (PARTITION BY event_type ORDER BY value)
        |   + (count(*) OVER (PARTITION BY event_type, value) - 1) / 2.0)
        |   / count(*) OVER (PARTITION BY event_type), 6) AS rank_pct,
        | round((value - avg(value) OVER (PARTITION BY event_type))
        |   / stddev_samp(value) OVER (PARTITION BY event_type), 6) AS zscore,
        | round(value * 1.0 / sum(abs(value)) OVER (PARTITION BY event_type), 8) AS scaled,
        | round(value - avg(value) OVER (PARTITION BY event_type), 6) AS demeaned
        |FROM events ORDER BY event_type, event_id""".stripMargin,
    "q25_event_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour,
        | event_type, count(*) AS n, round(sum(value), 2) AS sum_value,
        | count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
  )
}
