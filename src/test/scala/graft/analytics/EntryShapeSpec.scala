package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Shape + invariant checks for the round-6 entries (q92/q93/q94)
  * on sf0.001 — value-level correctness is the driver's DuckDB gate
  * at sf0.01; these pin the invariants that don't need an oracle. */
class EntryShapeSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("q92 screener mask: every surviving row satisfies the full chain") {
    val rows = FactorQueries.screenerMask(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Double]("pe") >= 10.0 && r.getAs[Double]("pe") <= 48.0)
      assert(r.getAs[Double]("roe_ttm") >= 0.05)
      assert(r.getAs[Double]("pct_chg") >= -5.0 && r.getAs[Double]("pct_chg") <= 10.0)
      assert(r.getAs[Double]("rsi_14") >= 40.0)
      assert(r.getAs[Double]("month_mom") >= -0.20)
      assert(r.getAs[Double]("volatility") <= 1.0)
    }
  }

  test("q132 CMS: estimates are one-sided (never under the true count)") {
    val rows = CorpusQueries.cmsFrequency(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("cms_n") >= r.getAs[Long]("true_n"),
        s"CMS undercounted: $r")
    }
  }

  test("q94 sector equity: curve is positive and starts near 1") {
    val rows = FactorQueries.sectorEquityCurve(spark, sf)
      .filter(col("day") === 2).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val eq = r.getAs[Double]("equity")
      val chg = r.getAs[Double]("sector_chg")
      // day 2 is the first curve point: equity = 1 + chg/100 exactly
      assert(math.abs(eq - (1.0 + chg / 100.0)) < 2e-6, s"equity $eq vs chg $chg")
      assert(eq > 0.0)
    }
  }

  test("q95 streaming EMA: bit-exact parity with the batch recursion") {
    import graft.streaming.StreamQueries
    val streamed = StreamQueries.streamedEma(spark, sf)
    val batch = graft.ops.TsOps.ema(
      StreamQueries.emaSlice(spark, sf), "stock", Seq("day"), "close",
      StreamQueries.emaAlpha, "ema_batch")
      .select("stock", "day", "ema_batch")
    val r = streamed.join(batch, Seq("stock", "day"), "full_outer")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("ema_stream") === col("ema_batch"), 1L).otherwise(0L))
          .as("n_bitexact"),
        max(abs(col("ema_stream") - col("ema_batch"))).as("max_abs_diff"),
        sum(when(col("ema_stream").isNull || col("ema_batch").isNull, 1L)
          .otherwise(0L)).as("n_unmatched"))
      .collect()(0)
    assert(r.getAs[Long]("n_rows") > 0)
    assert(r.getAs[Long]("n_bitexact") == r.getAs[Long]("n_rows"))
    assert(r.getAs[Long]("n_unmatched") == 0)
    assert(r.getAs[Double]("max_abs_diff") == 0.0)
  }

  test("q93 ingest roundtrip: counts, merge sums and code suffixes") {
    val rows = IngestQueries.ingestRoundtrip(spark, sf).collect()
    assert(rows.length == 4)
    val byCode = rows.map(r => r.getAs[String]("code") -> r).toMap
    assert(byCode.keySet == Set("000002.SZ", "430047.BJ", "600001.SH", "688001.SH"))
    rows.foreach { r =>
      assert(r.getAs[Long]("n") == 600) // 3 zips x 200 good rows, bad lines skipped
      // the qfq/hfq merge found every key: sums scale exactly
      assert(r.getAs[Double]("sum_px_qfq") == r.getAs[Double]("sum_px") * 0.5)
      assert(r.getAs[Double]("sum_px_hfq") == r.getAs[Double]("sum_px") * 2.0)
    }
    // X6 sector hash rides the summary: md5 16-hex prefix of
    // "industry_<exchange prefix>", distinct per prefix
    val sectorIds = rows.map(_.getAs[String]("sector_id"))
    assert(sectorIds.forall(_.matches("[0-9a-f]{16}")))
    assert(sectorIds.distinct.length == 4)
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("industry_600".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)
    assert(byCode("600001.SH").getAs[String]("sector_id") == expected)
  }
}
