package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the rolling-operator conventions (SURVEY.md §2.5, §7.3-2)
  * against hand-computed frames. Series: one entity "A" with values
  * 3, 1, 4, 1, 5, 9, 2, 6 and a second entity "B" to prove partition
  * isolation.
  */
class TsOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    ("A", 1, 3.0), ("A", 2, 1.0), ("A", 3, 4.0), ("A", 4, 1.0),
    ("A", 5, 5.0), ("A", 6, 9.0), ("A", 7, 2.0), ("A", 8, 6.0),
    ("B", 1, 10.0), ("B", 2, 20.0)).toDF("k", "t", "x")

  private val w = Window.partitionBy("k").orderBy("t")

  private def seriesA(c: org.apache.spark.sql.Column): Seq[Any] =
    df.withColumn("y", c).filter($"k" === "A").orderBy("t")
      .select("y").collect().map(_.get(0)).toSeq

  test("delay lags within partition; nulls at head; partitions isolated") {
    assert(seriesA(TsOps.delay($"x", 2, w)) ===
      Seq(null, null, 3.0, 1.0, 4.0, 1.0, 5.0, 9.0))
    val b = df.withColumn("y", TsOps.delay($"x", 1, w))
      .filter($"k" === "B").orderBy("t").select("y").collect().map(_.get(0))
    assert(b === Seq(null, 10.0)) // does not see A's tail
  }

  test("delta(x,1) = x - delay(x,1)") {
    assert(seriesA(TsOps.delta($"x", 1, w)) ===
      Seq(null, -2.0, 3.0, -3.0, 4.0, 4.0, -7.0, 4.0))
  }

  test("rolling sum/min/max over 3 rows, partial head frames") {
    assert(seriesA(TsOps.tsSum($"x", 3, w)) ===
      Seq(3.0, 4.0, 8.0, 6.0, 10.0, 15.0, 16.0, 17.0))
    assert(seriesA(TsOps.tsMin($"x", 3, w)) ===
      Seq(3.0, 1.0, 1.0, 1.0, 1.0, 1.0, 2.0, 2.0))
    assert(seriesA(TsOps.tsMax($"x", 3, w)) ===
      Seq(3.0, 3.0, 4.0, 4.0, 5.0, 9.0, 9.0, 9.0))
  }

  test("tsArgMax: rows since the OLDEST max; 0 = current row") {
    // window [3,1,4]: max 4 at newest → 0; [4,1,5]: max 5 newest → 0;
    // [5,9,2]: max 9 one row back → 1; [9,2,6]: max 9 two rows back → 2
    assert(seriesA(TsOps.tsArgMax($"x", 3, w)) ===
      Seq(0.0, 1.0, 0.0, 1.0, 0.0, 0.0, 1.0, 2.0))
  }

  test("tsArgMax tie → oldest occurrence (largest offset)") {
    val t = Seq(("A", 1, 5.0), ("A", 2, 3.0), ("A", 3, 5.0)).toDF("k", "t", "x")
    val r = t.withColumn("y", TsOps.tsArgMax($"x", 3, w))
      .orderBy("t").select("y").collect().map(_.getDouble(0))
    assert(r.last === 2.0) // ties at rows 1 and 3 → oldest wins
  }

  test("tsRank: (# values <= current) / window size") {
    // [3]→1/1; [3,1]→1/2; [3,1,4]→3/3; [1,4,1]→2/3 (ties count);
    // [4,1,5]→3/3; [1,5,9]→3/3; [5,9,2]→1/3; [9,2,6]→2/3
    val got = seriesA(TsOps.tsRank($"x", 3, w)).map(_.asInstanceOf[Double])
    val exp = Seq(1.0, 0.5, 1.0, 2.0 / 3, 1.0, 1.0, 1.0 / 3, 2.0 / 3)
    got.zip(exp).foreach { case (g, e) => assert(math.abs(g - e) < 1e-12) }
  }

  test("decayLinear: weights 1..n, newest heaviest") {
    // frame [3,1,4] → (3*1 + 1*2 + 4*3)/6 = 17/6
    val got = seriesA(TsOps.decayLinear($"x", 3, w)).map(_.asInstanceOf[Double])
    assert(math.abs(got(2) - 17.0 / 6) < 1e-12)
    assert(math.abs(got.head - 3.0) < 1e-12) // single-row frame = identity
  }

  test("tsProduct multiplies exactly, handles zero and negatives") {
    val t = Seq(("A", 1, 2.0), ("A", 2, -3.0), ("A", 3, 0.0), ("A", 4, 4.0))
      .toDF("k", "t", "x")
    val r = t.withColumn("y", TsOps.tsProduct($"x", 3, w))
      .orderBy("t").select("y").collect().map(_.getDouble(0))
    assert(r === Array(2.0, -6.0, 0.0, 0.0))
  }

  test("ema: pandas ewm(adjust=False) recursion, reset per key") {
    val t = Seq(("A", 1, 10.0), ("A", 2, 20.0), ("A", 3, 30.0),
      ("B", 1, 100.0), ("B", 2, 50.0)).toDF("k", "t", "x")
    val r = TsOps.ema(t, "k", Seq("t"), "x", alpha = 0.5, outCol = "ema")
      .orderBy("k", "t").select("ema").collect().map(_.getDouble(0))
    // A: 10; 0.5*20+0.5*10=15; 0.5*30+0.5*15=22.5. B: 100; 75.
    assert(r === Array(10.0, 15.0, 22.5, 100.0, 75.0))
  }

  test("cumSum and cumProdPositive") {
    assert(seriesA(TsOps.cumSum($"x", w)) ===
      Seq(3.0, 4.0, 8.0, 9.0, 14.0, 23.0, 25.0, 31.0))
    val cp = seriesA(TsOps.cumProdPositive($"x", w)).map(_.asInstanceOf[Double])
    assert(math.abs(cp(2) - 12.0) < 1e-9) // 3*1*4
  }
}
