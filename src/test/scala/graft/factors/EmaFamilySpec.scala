package graft.factors

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Pins [[EmaFamily]]'s recursions against an independent plain-Scala
  * reference of pandas `ewm(adjust=False)` — including state reset
  * between stocks, the null day-1 force input, and the chained
  * (k->d, tema, mass) series. */
class EmaFamilySpec extends SparkSpec {
  import spark.implicits._

  // two stocks to prove the state machine resets
  private val closes = Map(
    1L -> Seq(10.0, 11.0, 9.0, 12.0, 12.0, 13.0),
    2L -> Seq(50.0, 48.0, 52.0, 51.0, 49.0, 55.0))
  private val highs = closes.map { case (s, c) => s -> c.map(_ + 1.0) }
  private val lows = closes.map { case (s, c) => s -> c.map(_ - 1.5) }
  private val vols = Map(
    1L -> Seq(100L, 200L, 150L, 300L, 250L, 180L),
    2L -> Seq(500L, 400L, 600L, 550L, 450L, 700L))

  /** ewm(adjust=False) with null-carry. */
  private def emaRef(xs: Seq[Option[Double]], a: Double): Seq[Option[Double]] = {
    var st: Option[Double] = None
    xs.map { x =>
      st = x match {
        case Some(v) => Some(st.fold(v)(p => a * v + (1 - a) * p))
        case None => st
      }
      st
    }
  }

  private lazy val out: Map[(Long, Long), Row] = {
    val rows = for {
      s <- Seq(1L, 2L); i <- 0 until 6
    } yield (s, (i + 1).toLong, closes(s)(i), highs(s)(i), lows(s)(i), vols(s)(i))
    val df = rows.toDF("stock", "day", "close", "high", "low", "volume")
    EmaFamily.compute(df).collect()
      .map(r => (r.getAs[Long]("stock"), r.getAs[Long]("day")) -> r).toMap
  }

  private def col(stock: Long, name: String): Seq[Option[Double]] =
    (1L to 6L).map { d =>
      val r = out((stock, d))
      val i = r.fieldIndex(name)
      if (r.isNullAt(i)) None else Some(r.getDouble(i))
    }

  private def assertSeq(actual: Seq[Option[Double]], expect: Seq[Option[Double]],
                        label: String): Unit =
    actual.zip(expect).zipWithIndex.foreach { case ((a, e), i) =>
      (a, e) match {
        case (Some(av), Some(ev)) =>
          assert(math.abs(av - ev) < 1e-9, s"$label day ${i + 1}: $av vs $ev")
        case _ => assert(a == e, s"$label day ${i + 1}: $a vs $e")
      }
    }

  for (s <- Seq(1L, 2L)) {
    val c = closes(s).map(Some(_))

    test(s"macd diff/dea (stock $s)") {
      val e12 = emaRef(c, EmaFamily.aMacdFast)
      val e26 = emaRef(c, EmaFamily.aMacdSlow)
      val diff = e12.zip(e26).map { case (a, b) => Some((a.get - b.get) * 2.0) }
      assertSeq(col(s, "macd_diff"), diff, "macd_diff")
      assertSeq(col(s, "macd_dea"), emaRef(diff, EmaFamily.aSignal), "macd_dea")
    }

    test(s"kdj k/d/j from 9-day rsv (stock $s)") {
      val rsv = (0 until 6).map { i =>
        val h9 = highs(s).slice(math.max(0, i - 8), i + 1).max
        val l9 = lows(s).slice(math.max(0, i - 8), i + 1).min
        Some((closes(s)(i) - l9) / (h9 - l9) * 100.0)
      }
      val k = emaRef(rsv, EmaFamily.aKdj)
      val d = emaRef(k, EmaFamily.aKdj)
      assertSeq(col(s, "kdj_k"), k, "kdj_k")
      assertSeq(col(s, "kdj_d"), d, "kdj_d")
      val j = k.zip(d).map { case (a, b) => Some(3.0 * a.get - 2.0 * b.get) }
      assertSeq(col(s, "kdj_j"), j, "kdj_j")
    }

    test(s"trix_12 = TEMA rate of change, null day 1 (stock $s)") {
      val t3 = emaRef(emaRef(emaRef(c, EmaFamily.aTrix), EmaFamily.aTrix), EmaFamily.aTrix)
      val trix = None +: t3.sliding(2).map {
        case Seq(p, t) => Some((t.get - p.get) / p.get)
      }.toSeq
      assertSeq(col(s, "trix_12"), trix, "trix_12")
    }

    test(s"force_13 starts at day 2 (null day-1 input) (stock $s)") {
      val fin = None +: (1 until 6).map(i =>
        Some((closes(s)(i) - closes(s)(i - 1)) * vols(s)(i))).toSeq
      assertSeq(col(s, "force_13"), emaRef(fin, EmaFamily.aForce), "force_13")
    }

    test(s"mass_25 = rolling sum of EMA(hl,9)/EMA(EMA(hl,9),9) (stock $s)") {
      val hl = (0 until 6).map(i => Some(highs(s)(i) - lows(s)(i)))
      val m1 = emaRef(hl, EmaFamily.aMass)
      val m2 = emaRef(m1, EmaFamily.aMass)
      val ratio = m1.zip(m2).map { case (a, b) => a.get / b.get }
      val mass = ratio.indices.map(i =>
        Some(ratio.slice(math.max(0, i - 24), i + 1).sum))
      assertSeq(col(s, "mass_25"), mass, "mass_25")
    }
  }
}
