package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The SQL-function surface: both installation paths resolve the
  * names, and every name evaluates EXACTLY like the Column helper it
  * wraps (same Catalyst tree — this is the no-UDF guarantee). */
class GraftFunctionsSpec extends SparkSpec {

  test("registry path: names resolve and match the Column API, idempotently") {
    GraftFunctions.register(spark)
    GraftFunctions.register(spark) // re-install must be a no-op
    import spark.implicits._
    val docs = Seq("  The Quick   brown fox ", "a a a!", "Spark SQL")
      .toDF("text")
    docs.createOrReplaceTempView("gfs_docs")
    val viaSql = spark.sql(
      """SELECT graft_fingerprint(text) AS fp, graft_quality(text) AS q,
        |  graft_lang_guess(text) AS lg, graft_hash60(text) AS h
        |FROM gfs_docs""".stripMargin).collect()
    val viaCol = docs.select(
      TextFns.fingerprint(col("text")).as("fp"),
      TextFns.qualityScore(col("text")).as("q"),
      TextFns.langGuess(col("text")).as("lg"),
      DedupFns.portableHash60(col("text")).as("h")).collect()
    assert(viaSql.map(_.toSeq).toSeq == viaCol.map(_.toSeq).toSeq)
    // the aggregate: bottom-k distinct hashes, exactly KmvMinK's
    val mins = spark.sql(
      "SELECT graft_kmv_min_k(graft_hash60(text), 2) FROM gfs_docs")
      .head().getSeq[Long](0)
    val expected = docs.select(DedupFns.portableHash60(col("text")).as("h"))
      .distinct().orderBy("h").limit(2).collect().map(_.getLong(0)).toSeq
    assert(mins == expected)
    // k must be a literal — a column reference is rejected at analysis
    val err = intercept[Exception] {
      spark.sql("SELECT graft_kmv_min_k(graft_hash60(text), length(text)) FROM gfs_docs")
        .collect()
    }
    assert(err.getMessage.contains("literal"), err.getMessage)
    // input-type contract (ImplicitCastInputTypes): numerics coerce
    // to long through a well-defined Cast — never the executor-side
    // ClassCastException an unchecked update() would throw — and a
    // non-castable type is an analysis error
    assert(spark.sql("SELECT graft_kmv_min_k(CAST(length(text) AS INT), 2) FROM gfs_docs")
      .head().getSeq[Long](0).nonEmpty)
    val typeErr = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_kmv_min_k(array(1), 2) FROM gfs_docs").collect()
    }
    assert(typeErr.getMessage.toLowerCase.contains("type"), typeErr.getMessage)
  }

  test("quant tier: named w-ops == TsOps window helpers, value and tree") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val panel = Seq((1L, 1L, 10.0), (1L, 2L, 30.0), (1L, 3L, 20.0),
        (1L, 4L, 20.0), (1L, 5L, 40.0), (2L, 1L, 5.0), (2L, 2L, 3.0))
      .toDF("stock", "day", "x")
    panel.createOrReplaceTempView("gfs_panel")
    // SQL text path: the named functions over a collect_list window
    val viaSql = spark.sql(
      """SELECT stock, day,
        |  graft_ts_rank(a) AS tsr, graft_ts_argmax(a) AS am,
        |  graft_decay_linear(a) AS dl
        |FROM (SELECT stock, day, collect_list(x) OVER
        |  (PARTITION BY stock ORDER BY day
        |   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS a FROM gfs_panel)
        |ORDER BY stock, day""".stripMargin).collect()
    // Column path: the TsOps WindowSpec helpers
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("stock").orderBy("day")
    val viaCol = panel.select(col("stock"), col("day"),
        graft.ops.TsOps.tsRank(col("x"), 3, w).as("tsr"),
        graft.ops.TsOps.tsArgMax(col("x"), 3, w).as("am"),
        graft.ops.TsOps.decayLinear(col("x"), 3, w).as("dl"))
      .orderBy("stock", "day").collect()
    assert(viaSql.map(_.toSeq).toSeq == viaCol.map(_.toSeq).toSeq)
    // SAME-TREE parity, not just value parity: the registered builder
    // delegates to the identical array-form kernel, so the analyzed
    // expression trees match node-for-node (canonicalized — attribute
    // ids differ per plan)
    import org.apache.spark.sql.graftbridge.ColumnBridge
    def canon(c: org.apache.spark.sql.Column): String = {
      val df = panel.select(c.as("y"))
      // compare the aliased EXPRESSION (the alias's own exprId is
      // per-plan and legitimately differs)
      df.queryExecution.analyzed.expressions.last.children.head
        .canonicalized.toString
    }
    val arr = array(lit(1.0), lit(2.0), lit(3.0))
    for ((name, kernel) <- Seq(
        "graft_ts_rank" -> graft.ops.TsOps.tsRankArr _,
        "graft_ts_argmax" -> graft.ops.TsOps.tsArgMaxArr _,
        "graft_decay_linear" -> graft.ops.TsOps.decayLinearArr _)) {
      val viaFn = canon(call_function(name, arr))
      val viaKernel = canon(kernel(arr))
      assert(viaFn == viaKernel, s"$name tree diverged:\n$viaFn\n$viaKernel")
    }
  }

  test("extensions path: a session built withExtensions resolves the names") {
    // getOrCreate only applies extensions to a NEW session: clear the
    // default/active session (same SparkContext is reused), build one
    // with the extensions installed, and restore afterwards
    val prev = SparkSession.getDefaultSession
    try {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val fp = s2.sql("SELECT graft_fingerprint('  A  b ') AS fp").head().getString(0)
      // md5 of the canonical form "a b"
      assert(fp == java.security.MessageDigest.getInstance("MD5")
        .digest("a b".getBytes("UTF-8")).map("%02x".format(_)).mkString)
    } finally {
      prev.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }
}
