package graft.factors

import graft.SparkSpec

/** Pins the Alpha101-specific operator conventions that differ from
  * TsOps: np.argmax first-occurrence indexing, scipy rankdata
  * average-tie raw ranks, and the null-safe cross-sectional rank. */
class Alpha101Spec extends SparkSpec {
  import spark.implicits._

  // 2 stocks x 5 days; stock 2 constant (zero-variance corr guard)
  private lazy val out = {
    val rows = for {
      (s, closes) <- Seq(1L -> Seq(10.0, 12.0, 12.0, 11.0, 12.0),
                         2L -> Seq(20.0, 20.0, 20.0, 20.0, 20.0))
      (c, i) <- closes.zipWithIndex
    } yield (s, (i + 1).toLong, s % 2, c, c + 1.0, c + 1.5, c - 1.0,
      100L + i, c, c * (100.0 + i), c * 10000.0)
    val df = rows.toDF("stock", "day", "industry", "open", "close",
      "high", "low", "volume", "vwap", "amount", "total_mv")
    Alpha101.compute(df).collect()
      .map(r => (r.getAs[Long]("stock"), r.getAs[Long]("day")) -> r).toMap
  }

  private def g(s: Long, d: Long, c: String): Option[Double] = {
    val r = out((s, d))
    val i = r.fieldIndex(c)
    if (r.isNullAt(i)) None else Some(r.getDouble(i))
  }

  test("alpha_004 ts_rank: scipy average-tie raw rank (1..n)") {
    // stock 1 r_low by day: ranks of low within each 2-stock day
    // stock1 low always the smaller -> r_low = 0.5 every day
    // ts_rank over 5 identical values = rankdata average = (5+1)/2 = 3
    assert(g(1L, 5L, "alpha_004").contains(-3.0))
  }

  test("alpha_001 argmax: first occurrence from window start") {
    // stock 1: ret(day4) < 0 so a1sig day4 = std20^2 (tiny); window
    // [100,144,144,std^2,144] -> first max at 0-based idx 1 -> a1arg 1
    // stock 2: constant close, a1sig = 400 -> argmax idx 0 -> a1arg 0
    // ranks: stock2 -> 0.5, stock1 -> 1.0; alpha = rank - 0.5
    assert(g(2L, 5L, "alpha_001").contains(0.0))
    assert(g(1L, 5L, "alpha_001").contains(0.5))
  }

  test("alpha_006 corr is null for a zero-variance window") {
    // stock 2: constant open -> vx = 0 -> null
    assert(g(2L, 5L, "alpha_006").isEmpty)
  }

  test("alpha_101 intraday momentum") {
    // (close - open) / (high - low + 0.001) = (12-11)/(2.5+0.001)
    val e = (12.0 - 11.0) / (13.5 - 11.0 + 0.001)
    assert(math.abs(g(1L, 5L, "alpha_101").get - e) < 1e-12)
  }

  test("alpha_048 present and finite once corr warm-up completes") {
    assert(g(1L, 5L, "alpha_048").forall(v => !v.isNaN && !v.isInfinite))
  }
}
