package graft.analytics

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Plane-A relational query shapes (SURVEY.md §2.2-§2.6, §2.8).
  *
  * Each entry re-expresses one query shape from the reference's data
  * layer (`app/Quantlib/QuantDB.py`) over the driver's TPC-H-ish
  * testdata. Every query has a DuckDB oracle in [[oracles]] with
  * IDENTICAL output column names; floating outputs are rounded at a
  * grain the data's decimal precision makes exact (see scaladocs).
  *
  * Scale notes are per-query; the common rules:
  *  - dims (region/nation) are explicitly `broadcast()` — at 100 TB
  *    they stay KB-sized;
  *  - fact-fact joins shuffle on their equi-key and rely on AQE for
  *    skew; no driver-side collect anywhere;
  *  - predicates/projections are plain Column exprs on the scan so
  *    Catalyst pushes them into parquet.
  */
object RelationalQueries {
  private type Q = (SparkSession, String) => DataFrame

  /** A2-style grouped multi-aggregate (cf. QuantDB.py:293-310 sector
    * rotation). Map-side partial agg → 6 groups; scale-free. */
  def pricingSummary: Q = (s, dir) => {
    val li = Tables.load(s, dir, "lineitem")
    li.groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc_price"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** A1/A4/A5: ungrouped multi-aggregate + conditional counts + date
    * min/max (cf. QuantDB.py:371-404 market general stats). */
  def globalStats: Q = (s, dir) => {
    val li = Tables.load(s, dir, "lineitem")
    li.agg(
      count(lit(1)).as("n"),
      sum("l_quantity").as("sum_qty"),
      round(avg("l_extendedprice"), 4).as("avg_price"),
      round(median(col("l_quantity")), 4).as("median_qty"),
      round(median(col("l_extendedprice")), 4).as("median_price"),
      count(when(col("l_discount") > 0.05, 1)).as("n_disc_hi"),
      count(when(col("l_discount") < 0.01, 1)).as("n_disc_lo"),
      date_format(min("l_shipdate"), "yyyy-MM-dd").as("min_ship"),
      date_format(max("l_shipdate"), "yyyy-MM-dd").as("max_ship"))
  }

  /** J1 proper: the 6-way NULL-PRESERVING left-join wide table with a
    * LIMIT cap (QuantDB.py:158-179 screener semantics — customers
    * with no orders keep null feature columns, nothing coalesced).
    * Includes X6 code normalization (`_fix_code`: zero-pad + market
    * suffix). Feature aggregates shuffle on custkey; dims broadcast. */
  def leftWide: Q = (s, dir) => {
    val c = Tables.load(s, dir, "customer")
    val o = Tables.load(s, dir, "orders")
    val li = Tables.load(s, dir, "lineitem")
    val n = Tables.load(s, dir, "nation")
    val r = Tables.load(s, dir, "region")
    val oAgg = o.groupBy(col("o_custkey").as("k1"))
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("revenue"))
    val hvAgg = o.filter(col("o_totalprice") > 250000)
      .groupBy(col("o_custkey").as("k2")).agg(count(lit(1)).as("n_big"))
    val liAgg = li.join(o.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("k3")).agg(sum("l_quantity").as("total_qty"))
    val code = lpad(col("c_custkey").cast("string"), 6, "0")
    c.join(oAgg, col("c_custkey") === col("k1"), "left")
      .join(hvAgg, col("c_custkey") === col("k2"), "left")
      .join(liAgg, col("c_custkey") === col("k3"), "left")
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"), "left")
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"), "left")
      .select(col("c_custkey"),
        concat(code, when(substring(code, 1, 1) === "6", ".SH").otherwise(".SZ"))
          .as("norm_code"),
        col("n_name"), col("r_name"), col("n_orders"), col("revenue"),
        col("n_big"), col("total_qty"))
      .orderBy("c_custkey")
      .limit(100)
  }

  /** J9: FULL OUTER join of two monthly aggregates (sentiment-ETL
    * merge shape, `Project report.md:736`) — unmatched months keep
    * nulls on the absent side. */
  def fullOuterMonths: Q = (s, dir) => {
    val o = Tables.load(s, dir, "orders")
      .groupBy(date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("order_value"))
    val li = Tables.load(s, dir, "lineitem")
      .groupBy(date_format(date_trunc("month", col("l_shipdate")), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n_ship_items"), sum("l_quantity").as("ship_qty"))
    o.join(li, Seq("month"), "full_outer")
      .orderBy("month")
  }

  /** X4/X5: streak-digit regexp parse (main.py:76-80) + monetary text
    * parse ("12.5万" → float): a deterministic money string is built
    * from the price, then parsed back with regexp + unit multiplier —
    * the reference's 亿/万 ingestion kernel end-to-end. */
  def textParse: Q = (s, dir) => {
    val o = Tables.load(s, dir, "orders")
    val parsed = o
      .withColumn("streak",
        regexp_extract(col("o_orderpriority"), "^(\\d+)", 1).cast("int"))
      .withColumn("money_str",
        when(col("o_totalprice") >= 100000,
          concat(round(col("o_totalprice") / 10000.0, 2).cast("string"), lit("万")))
          .otherwise(round(col("o_totalprice"), 2).cast("string")))
      .withColumn("parsed",
        regexp_extract(col("money_str"), "^([0-9.]+)", 1).cast("double") *
          when(col("money_str").contains("万"), 10000.0).otherwise(1.0))
    parsed.groupBy("streak")
      .agg(count(lit(1)).as("n"),
        round(sum("parsed") / 1e6, 4).as("total_m"),
        count(when(col("money_str").contains("万"), 1)).as("n_wan"))
      .orderBy("streak")
  }

  /** P1/P2/P5: projection + equality/range predicates that must reach
    * the parquet scan as PushedFilters (cf. QuantDB.py:68-75). */
  def filterProject: Q = (s, dir) => {
    val li = Tables.load(s, dir, "lineitem")
    li.filter(col("l_returnflag") === "R"
        && col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** P3/P4 + §2.8 strings: CASE WHEN + LIKE + substring/cast
    * (cf. main.py:76-80 streak→height parse). */
  def caseString: Q = (s, dir) => {
    val o = Tables.load(s, dir, "orders")
    o.withColumn("prio_num", substring(col("o_orderpriority"), 1, 1).cast("int"))
      .withColumn("urgency",
        when(col("o_orderpriority").like("1-%") || col("o_orderpriority").like("2-%"), "high")
          .when(col("o_orderpriority").like("3-%"), "mid")
          .otherwise("low"))
      .groupBy("urgency")
      .agg(count(lit(1)).as("n"),
        round(sum("o_totalprice"), 2).as("total"),
        min("prio_num").as("min_prio"),
        max(length(col("o_orderpriority"))).as("max_len"))
      .orderBy("urgency")
  }

  /** J1: the star-join wide table (cf. QuantDB.py:158-179 screener).
    * region/nation broadcast; lineitem⋈orders⋈customer shuffle on
    * their keys — the shape that must survive 100×. */
  def joinWide: Q = (s, dir) => {
    val li = Tables.load(s, dir, "lineitem")
    val o = Tables.load(s, dir, "orders")
    val c = Tables.load(s, dir, "customer")
    val n = Tables.load(s, dir, "nation")
    val r = Tables.load(s, dir, "region")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "o_orderpriority")
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
      .orderBy("r_name", "o_orderpriority")
  }

  /** J4/J11: fact ⋈ broadcast dims (cf. QuantDB.py:296-309). */
  def joinDims: Q = (s, dir) => {
    val su = Tables.load(s, dir, "supplier")
    val n = Tables.load(s, dir, "nation")
    val r = Tables.load(s, dir, "region")
    su.join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("n_suppliers"),
        round(avg("s_acctbal"), 4).as("avg_bal"),
        round(sum("s_acctbal"), 2).as("sum_bal"))
      .orderBy("r_name", "n_name")
  }

  /** J7: IN-subquery as left-semi join (cf. QuantDB.py:443-449
    * yesterday's limit-up pool). */
  def semiJoin: Q = (s, dir) => {
    val li = Tables.load(s, dir, "lineitem")
    val o = Tables.load(s, dir, "orders").filter(col("o_orderstatus") === "F")
    li.join(o.select("o_orderkey"), col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  /** NOT EXISTS as left-anti join: customers with no high-value
    * order. */
  def antiJoin: Q = (s, dir) => {
    val c = Tables.load(s, dir, "customer")
    val o = Tables.load(s, dir, "orders").filter(col("o_totalprice") > 250000)
    c.join(o.select("o_custkey"), col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_no_orders"))
      .orderBy("c_mktsegment")
  }

  /** J5 idiomatic replacement: lag window instead of self-join with a
    * scalar-subquery date anchor (cf. QuantDB.py:358-369). */
  def windowLag: Q = (s, dir) => {
    val o = Tables.load(s, dir, "orders")
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o.select(
      col("o_custkey"), col("o_orderkey"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
      date_format(lag("o_orderdate", 1).over(w), "yyyy-MM-dd").as("prev_date"),
      datediff(to_date(col("o_orderdate")), to_date(lag("o_orderdate", 1).over(w)))
        .as("gap_days"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** J8: multi-scalar-subquery single row via crossJoin of tiny
    * aggregates (cf. QuantDB.py:397-404). */
  def scalarStats: Q = (s, dir) => {
    val c = Tables.load(s, dir, "customer").agg(count(lit(1)).as("n_customers"))
    val o = Tables.load(s, dir, "orders")
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice") / 1e6, 4).as("total_rev_m"))
    val n = Tables.load(s, dir, "nation").agg(count(lit(1)).as("n_nations"))
    c.crossJoin(o).crossJoin(n)
      .select("n_customers", "n_orders", "n_nations", "total_rev_m")
  }

  /** T1/T2: global top-k → TakeOrderedAndProject, no full sort
    * (cf. QuantDB.py:154, 190-202). Deterministic tie-break on key. */
  def topkCustomers: Q = (s, dir) => {
    val c = Tables.load(s, dir, "customer")
    val o = Tables.load(s, dir, "orders")
    o.groupBy("o_custkey")
      .agg(round(sum("o_totalprice"), 2).as("revenue"), count(lit(1)).as("n_orders"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("revenue"), col("n_orders"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(10)
  }

  /** A7: DISTINCT projection (cf. QuantDB.py:333). */
  def distinctSegments: Q = (s, dir) =>
    Tables.load(s, dir, "customer")
      .select("c_nationkey", "c_mktsegment").distinct()
      .orderBy("c_nationkey", "c_mktsegment")

  /** A2: GROUP BY + HAVING (cf. QuantDB.py:293-310 `HAVING stock_count > 3`). */
  def brandHaving: Q = (s, dir) =>
    Tables.load(s, dir, "part")
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"), round(avg("p_retailprice"), 4).as("avg_price"))
      .filter(col("n") > 10)
      .orderBy("p_brand")

  /** A9: decile bucketing + per-group stats (cf. pages/5_Alpha
    * lab.py:129-130 qcut→group mean). Exact ntile(10) semantics
    * WITHOUT the single-partition window: range-exchange on the sort
    * key, local row_number per partition, then add per-partition
    * offsets (a partition-count-sized aggregate, broadcast back).
    * Global rank = offset + local rank holds for any range-boundary
    * choice, so the plan is exact and every stage stays distributed
    * at 100 TB (the only tiny step is the ~#partitions-row cumsum). */
  def decileStats: Q = (s, dir) => {
    val o = Tables.load(s, dir, "orders").select("o_orderkey", "o_totalprice")
    // spark_partition_id is non-deterministic, so Catalyst cannot
    // collapse the projection across the range exchange — pid is
    // pinned to the range-partitioned layout.
    //
    // INVARIANT (ADVICE round-2 item 2): `local` and `counts` below
    // both consume THIS `ranged` value, i.e. the same logical
    // subtree. Range-boundary sampling is per-materialization, so
    // correctness requires both branches to observe one physical
    // exchange: the subtrees canonicalize identically, so Spark's
    // ReuseExchange rule (on by default, also under AQE) rewrites the
    // second scan as ReusedExchange. DecilePlanSpec asserts the
    // executed plan carries exactly one rangepartitioning exchange.
    val ranged = o.repartitionByRange(col("o_totalprice"), col("o_orderkey"))
      .withColumn("pid", spark_partition_id())
    val localW = Window.partitionBy("pid").orderBy("o_totalprice", "o_orderkey")
    val local = ranged.withColumn("lrn", row_number().over(localW))
    val counts = local.groupBy("pid").agg(count(lit(1)).as("cnt"))
    val offW = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("off", coalesce(sum("cnt").over(offW), lit(0L)))
      .crossJoin(counts.agg(sum("cnt").as("n_total")))
      .select("pid", "off", "n_total")
    // ntile(k): first (n mod k) buckets get ceil(n/k) rows, the rest
    // floor(n/k) — reproduced arithmetically from the global rank.
    val ranked = local.join(broadcast(offsets), "pid")
      .withColumn("grank", col("lrn") + col("off"))
    // exact long arithmetic (div, not double /): q = n div k, r = n % k
    val decile = expr(
      """CASE WHEN grank <= (n_total % 10) * (n_total div 10 + 1)
        |     THEN (grank + (n_total div 10)) div (n_total div 10 + 1)
        |     ELSE (n_total % 10) + (grank - (n_total % 10) * (n_total div 10 + 1)
        |            + (n_total div 10) - 1) div (n_total div 10)
        |END""".stripMargin)
    ranked.withColumn("decile", decile.cast("int"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n"),
        round(avg("o_totalprice"), 4).as("avg_price"),
        round(min("o_totalprice"), 2).as("min_price"),
        round(max("o_totalprice"), 2).as("max_price"))
      .orderBy("decile")
  }

  /** Per-group top-N via row_number (cf. screener sort+head, T5). */
  def windowTopN: Q = (s, dir) => {
    val o = Tables.load(s, dir, "orders")
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("rn"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
      .orderBy("o_custkey", "rn")
  }

  /** Cumulative sum per entity (cf. pages/5_Alpha lab.py:108
    * cumulative IC). Same accumulation order in Spark and the oracle
    * → bitwise-stable before rounding. */
  def cumulativeRevenue: Q = (s, dir) => {
    val o = Tables.load(s, dir, "orders")
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o.select(col("o_custkey"), col("o_orderkey"),
      round(sum("o_totalprice").over(w), 2).as("cum_revenue"),
      count(lit(1)).over(w).as("cum_orders"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** A11: Pearson corr / covariance / stddev per group
    * (cf. pages/5_Alpha lab.py:51 corrwith). */
  def corrStats: Q = (s, dir) =>
    Tables.load(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(round(corr("l_quantity", "l_extendedprice"), 6).as("corr_qty_price"),
        round(covar_samp("l_quantity", "l_extendedprice"), 2).as("covar_qty_price"),
        round(stddev_samp("l_quantity"), 6).as("std_qty"))
      .orderBy("l_returnflag")

  /** A11/A12: Spearman rank correlation = Pearson over average-tie
    * ranks (the Rank-IC kernel, SURVEY.md §2.4). Tie handling matches
    * pandas `rank()` exactly: min-rank + (ties-1)/2. */
  def spearmanIc: Q = (s, dir) => {
    val li = Tables.load(s, dir, "lineitem")
    def avgRank(c: String): org.apache.spark.sql.Column = {
      val r = rank().over(Window.partitionBy("l_returnflag").orderBy(c))
      val ties = count(lit(1)).over(Window.partitionBy(col("l_returnflag"), col(c)))
      r + (ties - lit(1)) / lit(2.0)
    }
    li.select(col("l_returnflag"),
        avgRank("l_discount").as("rx"), avgRank("l_tax").as("ry"))
      .groupBy("l_returnflag")
      .agg(round(corr("rx", "ry"), 6).as("spearman_disc_tax"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  /** A10: explicit-edge histogram binning (cf. pages/1_Market
    * overview.py:99-102 pd.cut). */
  def priceHistogram: Q = (s, dir) => {
    val o = Tables.load(s, dir, "orders")
    val bin = when(col("o_totalprice") < 50000, "b0_lt50k")
      .when(col("o_totalprice") < 100000, "b1_50_100k")
      .when(col("o_totalprice") < 200000, "b2_100_200k")
      .when(col("o_totalprice") < 300000, "b3_200_300k")
      .otherwise("b4_ge300k")
    o.groupBy(bin.as("bucket")).agg(count(lit(1)).as("n"))
      .orderBy("bucket")
  }

  val entries: Map[String, Q] = Map(
    "q01_pricing_summary" -> pricingSummary,
    "q02_global_stats" -> globalStats,
    "q03_filter_project" -> filterProject,
    "q04_case_string" -> caseString,
    "q05_join_wide" -> joinWide,
    "q06_join_dims" -> joinDims,
    "q07_semi_join" -> semiJoin,
    "q08_anti_join" -> antiJoin,
    "q09_window_lag" -> windowLag,
    "q10_scalar_stats" -> scalarStats,
    "q11_topk_customers" -> topkCustomers,
    "q12_distinct_segments" -> distinctSegments,
    "q13_brand_having" -> brandHaving,
    "q14_decile_stats" -> decileStats,
    "q15_window_topn" -> windowTopN,
    "q16_cumulative_revenue" -> cumulativeRevenue,
    "q17_corr_stats" -> corrStats,
    "q18_spearman_ic" -> spearmanIc,
    "q19_price_histogram" -> priceHistogram,
    "q50_left_wide" -> leftWide,
    "q51_full_outer_months" -> fullOuterMonths,
    "q52_text_parse" -> textParse,
  )

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base,
        | round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
        | round(avg(l_discount), 6) AS avg_disc, count(*) AS n
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q02_global_stats" ->
      """SELECT count(*) AS n, sum(l_quantity) AS sum_qty,
        | round(avg(l_extendedprice), 4) AS avg_price,
        | round(median(l_quantity), 4) AS median_qty,
        | round(median(l_extendedprice), 4) AS median_price,
        | count(*) FILTER (WHERE l_discount > 0.05) AS n_disc_hi,
        | count(*) FILTER (WHERE l_discount < 0.01) AS n_disc_lo,
        | strftime(min(l_shipdate), '%Y-%m-%d') AS min_ship,
        | strftime(max(l_shipdate), '%Y-%m-%d') AS max_ship
        |FROM lineitem""".stripMargin,
    "q03_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
        |FROM lineitem
        |WHERE l_returnflag = 'R' AND l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q04_case_string" ->
      """SELECT CASE WHEN o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%' THEN 'high'
        |            WHEN o_orderpriority LIKE '3-%' THEN 'mid' ELSE 'low' END AS urgency,
        | count(*) AS n, round(sum(o_totalprice), 2) AS total,
        | min(CAST(substr(o_orderpriority, 1, 1) AS INT)) AS min_prio,
        | max(length(o_orderpriority)) AS max_len
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q05_join_wide" ->
      """SELECT r_name, o_orderpriority, count(*) AS n,
        | round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q06_join_dims" ->
      """SELECT r_name, n_name, count(*) AS n_suppliers,
        | round(avg(s_acctbal), 4) AS avg_bal, round(sum(s_acctbal), 2) AS sum_bal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q07_semi_join" ->
      """SELECT l_returnflag, count(*) AS n FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q08_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n_no_orders FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 250000)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q09_window_lag" ->
      """SELECT o_custkey, o_orderkey,
        | strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        | strftime(lag(o_orderdate) OVER w, '%Y-%m-%d') AS prev_date,
        | date_diff('day', CAST(lag(o_orderdate) OVER w AS DATE),
        |           CAST(o_orderdate AS DATE)) AS gap_days
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q10_scalar_stats" ->
      """SELECT (SELECT count(*) FROM customer) AS n_customers,
        | (SELECT count(*) FROM orders) AS n_orders,
        | (SELECT count(*) FROM nation) AS n_nations,
        | (SELECT round(sum(o_totalprice) / 1e6, 4) FROM orders) AS total_rev_m""".stripMargin,
    "q11_topk_customers" ->
      """SELECT c_custkey, c_name, round(sum(o_totalprice), 2) AS revenue,
        | count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1, 2 ORDER BY revenue DESC, c_custkey LIMIT 10""".stripMargin,
    "q12_distinct_segments" ->
      """SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
        |ORDER BY 1, 2""".stripMargin,
    "q13_brand_having" ->
      """SELECT p_brand, count(*) AS n, round(avg(p_retailprice), 4) AS avg_price
        |FROM part GROUP BY 1 HAVING count(*) > 10 ORDER BY 1""".stripMargin,
    "q14_decile_stats" ->
      """SELECT decile, count(*) AS n, round(avg(o_totalprice), 4) AS avg_price,
        | round(min(o_totalprice), 2) AS min_price, round(max(o_totalprice), 2) AS max_price
        |FROM (SELECT o_totalprice,
        |        ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
        |      FROM orders)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q15_window_topn" ->
      """SELECT o_custkey, o_orderkey, rn, strftime(o_orderdate, '%Y-%m-%d') AS order_date
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate, o_orderkey) AS rn FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q16_cumulative_revenue" ->
      """SELECT o_custkey, o_orderkey,
        | round(sum(o_totalprice) OVER w, 2) AS cum_revenue,
        | count(*) OVER w AS cum_orders
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q17_corr_stats" ->
      """SELECT l_returnflag,
        | round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        | round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price,
        | round(stddev_samp(l_quantity), 6) AS std_qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q18_spearman_ic" ->
      """WITH ranked AS (
        | SELECT l_returnflag,
        |  rank() OVER (PARTITION BY l_returnflag ORDER BY l_discount)
        |    + (count(*) OVER (PARTITION BY l_returnflag, l_discount) - 1) / 2.0 AS rx,
        |  rank() OVER (PARTITION BY l_returnflag ORDER BY l_tax)
        |    + (count(*) OVER (PARTITION BY l_returnflag, l_tax) - 1) / 2.0 AS ry
        | FROM lineitem)
        |SELECT l_returnflag, round(corr(rx, ry), 6) AS spearman_disc_tax,
        | count(*) AS n
        |FROM ranked GROUP BY 1 ORDER BY 1""".stripMargin,
    "q19_price_histogram" ->
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'b0_lt50k'
        |            WHEN o_totalprice < 100000 THEN 'b1_50_100k'
        |            WHEN o_totalprice < 200000 THEN 'b2_100_200k'
        |            WHEN o_totalprice < 300000 THEN 'b3_200_300k'
        |            ELSE 'b4_ge300k' END AS bucket, count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q50_left_wide" ->
      """WITH o_agg AS (
        |  SELECT o_custkey AS k1, count(*) AS n_orders,
        |    round(sum(o_totalprice), 2) AS revenue
        |  FROM orders GROUP BY 1),
        |hv_agg AS (
        |  SELECT o_custkey AS k2, count(*) AS n_big
        |  FROM orders WHERE o_totalprice > 250000 GROUP BY 1),
        |li_agg AS (
        |  SELECT o_custkey AS k3, sum(l_quantity) AS total_qty
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1)
        |SELECT c_custkey,
        | lpad(CAST(c_custkey AS VARCHAR), 6, '0')
        |   || CASE WHEN substr(lpad(CAST(c_custkey AS VARCHAR), 6, '0'), 1, 1) = '6'
        |           THEN '.SH' ELSE '.SZ' END AS norm_code,
        | n_name, r_name, n_orders, revenue, n_big, total_qty
        |FROM customer
        |LEFT JOIN o_agg ON c_custkey = k1
        |LEFT JOIN hv_agg ON c_custkey = k2
        |LEFT JOIN li_agg ON c_custkey = k3
        |LEFT JOIN nation ON c_nationkey = n_nationkey
        |LEFT JOIN region ON n_regionkey = r_regionkey
        |ORDER BY c_custkey LIMIT 100""".stripMargin,
    "q51_full_outer_months" ->
      """WITH o AS (
        |  SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
        |    count(*) AS n_orders, round(sum(o_totalprice), 2) AS order_value
        |  FROM orders GROUP BY 1),
        |li AS (
        |  SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m') AS month,
        |    count(*) AS n_ship_items, sum(l_quantity) AS ship_qty
        |  FROM lineitem GROUP BY 1)
        |SELECT month, n_orders, order_value, n_ship_items, ship_qty
        |FROM o FULL OUTER JOIN li USING (month)
        |ORDER BY month""".stripMargin,
    "q52_text_parse" ->
      """WITH t AS (
        | SELECT CAST(regexp_extract(o_orderpriority, '^(\d+)', 1) AS INT) AS streak,
        |  CASE WHEN o_totalprice >= 100000
        |       THEN CAST(round(o_totalprice / 10000.0, 2) AS VARCHAR) || '万'
        |       ELSE CAST(round(o_totalprice, 2) AS VARCHAR) END AS money_str
        | FROM orders),
        |p AS (
        | SELECT streak, money_str,
        |  CAST(regexp_extract(money_str, '^([0-9.]+)', 1) AS DOUBLE)
        |    * CASE WHEN contains(money_str, '万') THEN 10000.0 ELSE 1.0 END AS parsed
        | FROM t)
        |SELECT streak, count(*) AS n, round(sum(parsed) / 1e6, 4) AS total_m,
        | count(*) FILTER (WHERE contains(money_str, '万')) AS n_wan
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
