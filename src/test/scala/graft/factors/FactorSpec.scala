package graft.factors

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Hand-computed frames pinning the [[Technical]] conventions:
  * trailing windows including the current row, fixed denominators,
  * null-guarded division, and the rsi/cci/aroon formula readings. */
class FactorSpec extends SparkSpec {
  import spark.implicits._

  // one stock, 5 days: closes 10,11,9,12,12
  private lazy val out: Map[Long, Row] = {
    val quotes = Seq(
      (1L, 1L, 10.0, 11.0, 9.0, 100L, 1000.0, 1.0),
      (1L, 2L, 11.0, 12.0, 10.0, 200L, 2200.0, 2.0),
      (1L, 3L, 9.0, 10.0, 8.0, 150L, 1350.0, 3.0),
      (1L, 4L, 12.0, 13.0, 11.0, 300L, 3600.0, 4.0),
      (1L, 5L, 12.0, 13.0, 11.0, 250L, 3000.0, 5.0),
    ).toDF("stock", "day", "close", "high", "low", "volume", "amount", "turnover")
    Technical.compute(quotes).collect().map(r => r.getAs[Long]("day") -> r).toMap
  }

  private def f(day: Long, col: String): Double = {
    val r = out(day)
    assert(!r.isNullAt(r.fieldIndex(col)), s"$col null at day $day")
    r.getAs[Double](col)
  }
  private def isNull(day: Long, col: String): Boolean =
    out(day).isNullAt(out(day).fieldIndex(col))

  test("ma_5 trailing mean includes current row, no min_periods") {
    assert(f(1, "ma_5") === 10.0)
    assert(math.abs(f(5, "ma_5") - 10.8) < 1e-12)
  }

  test("rsi_14 = 100*up/(up+down); null when no moves yet") {
    assert(isNull(1, "rsi_14")) // su=sd=0 -> guarded division
    assert(math.abs(f(2, "rsi_14") - 100.0) < 1e-12)
    // ups: +1,+3 = 4; downs: 2 -> 100*4/6
    assert(math.abs(f(5, "rsi_14") - 100.0 * 4 / 6) < 1e-12)
  }

  test("atr_14 averages true range with first-row tr = high-low") {
    // tr: 2, 2, 3, 4, 2
    assert(math.abs(f(5, "atr_14") - 2.6) < 1e-12)
  }

  test("boll bands = ma20 +/- 2*stddev_samp; null at n=1") {
    assert(isNull(1, "boll_upper")) // stddev_samp of 1 row -> null
    val expect = 10.5 + 2.0 * math.sqrt(0.5)
    assert(math.abs(f(2, "boll_upper") - expect) < 1e-12)
  }

  test("cci_14 = (tp - mean)/(0.015 * mean abs deviation)") {
    // tps d1..3: 10, 11, 9 -> mean 10, md 2/3; (9-10)/(0.015*2/3)
    assert(math.abs(f(3, "cci_14") - (-100.0)) < 1e-9)
  }

  test("wr_14 = (hh-c)/(hh-ll) * -100") {
    assert(math.abs(f(5, "wr_14") - (13.0 - 12.0) / (13.0 - 8.0) * -100.0) < 1e-12)
  }

  test("mfi_14 money-flow ratio uses tp direction") {
    // mf_pos: d2 2200, d4 3600; mf_neg: d3 1350; d5 flat
    assert(math.abs(f(5, "mfi_14") - 100.0 * 5800 / 7150) < 1e-9)
  }

  test("psy_12 keeps the fixed /12 denominator in warm-up") {
    assert(math.abs(f(5, "psy_12") - 2.0 / 12.0 * 100.0) < 1e-12)
  }

  test("aroon_osc_25 = (argmin_low - argmax_high) * 100/25") {
    // lows min 8 oldest at idx3 of 5 -> argmin 2; highs max 13 oldest idx4 -> 1
    assert(math.abs(f(5, "aroon_osc_25") - 4.0) < 1e-12)
  }

  test("obv_slope inputs: obv cumulative signed volume, null day 1") {
    assert(isNull(1, "obv"))
    assert(f(5, "obv") === 350.0)
  }
}
