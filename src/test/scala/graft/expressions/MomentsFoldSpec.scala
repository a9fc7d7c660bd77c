package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Pins [[MomentsFold]] BIT-IDENTICAL to the r15 staged collect_list
  * fold forms it replaced (TsOps.withSkewKurt / tsStddevCf before
  * r16): the fold association is the oracle contract — q40/q42/q44/
  * q45's DuckDB replays fold over `list(x) OVER w` — so the aggregate
  * must reproduce every double bit, not just be "close". The legacy
  * forms are reconstructed INLINE here (they no longer exist in main
  * source) and compared value-for-value over a fixture with nulls,
  * constant windows, single-row partitions and irrational inputs. */
class MomentsFoldSpec extends SparkSpec {

  private val d = 7
  private val W = Window.partitionBy("g").orderBy("i")
  private def t(w: org.apache.spark.sql.expressions.WindowSpec) =
    w.rowsBetween(-(d - 1), 0)

  /** The r15 staged fold forms, verbatim. */
  private def legacy(df: DataFrame, x: Column): DataFrame = {
    val arr = collect_list(x).over(t(W))
    df.withColumn("_arr", arr)
      .withColumn("_n", size(col("_arr")).cast(DoubleType))
      .withColumn("_mu", when(col("_n") > 0.0,
        aggregate(col("_arr"), lit(0.0), (a, v) => a + v) / col("_n")))
      .withColumn("_c2", aggregate(
        transform(col("_arr"), v => (v - col("_mu")) * (v - col("_mu"))),
        lit(0.0), (a, v) => a + v))
      .withColumn("_c3", aggregate(
        transform(col("_arr"),
          v => (v - col("_mu")) * (v - col("_mu")) * (v - col("_mu"))),
        lit(0.0), (a, v) => a + v))
      .withColumn("_c4", aggregate(
        transform(col("_arr"), v =>
          (v - col("_mu")) * (v - col("_mu")) * (v - col("_mu")) * (v - col("_mu"))),
        lit(0.0), (a, v) => a + v))
      .withColumn("skew_ref", when(col("_c2") =!= 0.0,
        sqrt(col("_n")) * col("_c3") / sqrt(col("_c2") * col("_c2") * col("_c2"))))
      .withColumn("kurt_ref", when(col("_c2") =!= 0.0,
        col("_n") * col("_c4") / (col("_c2") * col("_c2")) - 3.0))
      .withColumn("sdf_ref",
        when(col("_n") > 1.0, sqrt(col("_c2") / (col("_n") - 1.0))))
      .drop("_arr", "_n", "_mu", "_c2", "_c3", "_c4")
  }

  /** The r15 closed-form power-sum stddev, verbatim. */
  private def legacyCf(x: Column): Column = {
    val f = t(W)
    val n = count(lit(1)).over(f).cast(DoubleType)
    val vx = n * sum(x * x).over(f) - sum(x).over(f) * sum(x).over(f)
    when(n > 1, sqrt(vx / (n * (n - lit(1.0)))))
  }

  private lazy val fixture: DataFrame = {
    import spark.implicits._
    // deterministic, irrational-heavy values (sin of an integer is a
    // worst-case inexact double) + a null every 11th row + an
    // all-constant partition + a single-row partition
    val rows = (0 until 400).map { i =>
      val g = i % 4
      val v: java.lang.Double =
        if (i % 11 == 10) null
        else if (g == 2) 42.0
        else java.lang.Double.valueOf(math.sin(i.toDouble) * 100.0 + i % 13)
      (g, i, v)
    } :+ ((9, 0, java.lang.Double.valueOf(3.25)))
    rows.toDF("g", "i", "v")
  }

  private def bits(r: Row, i: Int): Any =
    if (r.isNullAt(i)) null else java.lang.Double.doubleToLongBits(r.getDouble(i))

  test("skew/kurt/stddev_fold match the staged collect_list folds bit for bit") {
    val got = graft.ops.TsOps.withSkewKurt(
      fixture, col("v"), d, W, "skew", "kurt", stddevName = Some("sd"))
    val want = legacy(fixture, col("v"))
    val joined = got.select("g", "i", "skew", "kurt", "sd")
      .join(want.select("g", "i", "skew_ref", "kurt_ref", "sdf_ref"), Seq("g", "i"))
      .orderBy("g", "i")
      .collect()
    assert(joined.length == 401)
    joined.foreach { r =>
      assert(bits(r, 2) == bits(r, 5), s"skew mismatch at ${r.getInt(0)}/${r.getInt(1)}")
      assert(bits(r, 3) == bits(r, 6), s"kurt mismatch at ${r.getInt(0)}/${r.getInt(1)}")
      assert(bits(r, 4) == bits(r, 7), s"stddev mismatch at ${r.getInt(0)}/${r.getInt(1)}")
    }
  }

  test("stddev_cf matches the window-sum closed form bit for bit on exact-grain input") {
    // 1/64-grain values (the panel's price grid): every power sum is
    // exact, the closed form's documented precondition
    import spark.implicits._
    val grain = (0 until 300).map { i =>
      val v: java.lang.Double =
        if (i % 13 == 12) null
        else java.lang.Double.valueOf(((i * 37 + 11) % 4096) / 64.0)
      (i % 3, i, v)
    }.toDF("g", "i", "v")
    val got = grain.select(col("g"), col("i"),
      graft.ops.TsOps.tsStddevCf(col("v"), d, W).as("sd"),
      legacyCf(col("v")).as("sd_ref"))
      .orderBy("g", "i").collect()
    got.foreach { r =>
      assert(bits(r, 2) == bits(r, 3), s"cf mismatch at ${r.getInt(0)}/${r.getInt(1)}")
    }
  }

  test("single-value and constant windows yield the legacy null conventions") {
    import spark.implicits._
    val tiny = Seq((0, 0, 5.0), (1, 0, 7.0), (1, 1, 7.0), (1, 2, 7.0))
      .toDF("g", "i", "v")
    val out = graft.ops.TsOps.withSkewKurt(
      tiny, col("v"), d, W, "skew", "kurt", stddevName = Some("sd"))
      .withColumn("cf", graft.ops.TsOps.tsStddevCf(col("v"), d, W))
      .orderBy("g", "i").collect()
    // n=1: all null (zero variance, n<=1)
    assert(out(0).isNullAt(3) && out(0).isNullAt(4) && out(0).isNullAt(5)
      && out(0).isNullAt(6))
    // constant window, n=3: zero variance -> skew/kurt null; stddevs 0
    assert(out(3).isNullAt(3) && out(3).isNullAt(4))
    assert(out(3).getDouble(5) == 0.0 && out(3).getDouble(6) == 0.0)
  }

  test("serialize/deserialize round-trips the buffer exactly") {
    val agg = MomentsFold(org.apache.spark.sql.graftbridge.ColumnBridge
      .expression(col("v")))
    val buf = agg.createAggregationBuffer()
    buf.nTotal = 7
    Seq(1.5, -2.25, math.Pi, 0.0).foreach(buf.append)
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.nTotal == 7 && back.len == buf.len)
    (0 until buf.len).foreach(i =>
      assert(java.lang.Double.doubleToLongBits(back.vs(i))
        == java.lang.Double.doubleToLongBits(buf.vs(i))))
    // merge concatenates in argument order (the window path never
    // merges; a groupBy use would see partition-order-dependent folds
    // — the class doc's documented restriction)
    val other = agg.createAggregationBuffer()
    other.nTotal = 2
    Seq(9.0, 10.0).foreach(other.append)
    val merged = agg.merge(buf, other)
    assert(merged.nTotal == 9 && merged.len == 6)
    assert(merged.vs(4) == 9.0 && merged.vs(5) == 10.0)
  }

  test("all-null window yields nulls, never a throw (ANSI)") {
    import spark.implicits._
    val nn = Seq((0, 0, null: java.lang.Double), (0, 1, null: java.lang.Double))
      .toDF("g", "i", "v")
    val out = graft.ops.TsOps.withSkewKurt(
      nn, col("v"), d, W, "skew", "kurt", stddevName = Some("sd"))
      .withColumn("cf", graft.ops.TsOps.tsStddevCf(col("v"), d, W))
      .orderBy("g", "i").collect()
    out.foreach { r =>
      assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6))
    }
  }
}
