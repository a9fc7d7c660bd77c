package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.PlanBridge

import scala.util.Random

/** Parity + plan pins for the batched TS-window operator:
  * [[TsWindowExec]] must be BIT-identical to Spark's WindowExec for
  * every supported function — sliding and unbounded-preceding row
  * frames, lag/lead offsets, null inputs, ±0.0, NaN, planted ties,
  * long columns, and groups shorter than the frame — while replacing
  * the per-frame machinery with one primitive group pass. The
  * fallback comparison runs THROUGH the same strategy with
  * `spark.graft.tsWindow=window`, so the two sides differ only in
  * the lowering. */
class TsWindowSpec extends SparkSpec {
  import spark.implicits._

  PlanBridge.installStrategy(spark, TsWindowStrategy)

  /** Random panel: nulls, exact ties, ±0.0, NaN, a long column, and
    * ragged group lengths (entity 1 has 2 rows — shorter than every
    * frame). */
  private lazy val panel: DataFrame = {
    val rnd = new Random(7)
    val rows = for {
      ent <- 1 to 23
      day <- 1 to (if (ent == 1) 2 else 5 + rnd.nextInt(35))
    } yield {
      val v = rnd.nextInt(10) match {
        case 0 => None
        case 1 => Some(0.0)
        case 2 => Some(-0.0)
        case 3 => Some(Double.NaN)
        case 4 => Some(rnd.nextInt(3).toDouble) // planted ties
        case _ => Some(rnd.nextDouble() * 100 - 50)
      }
      val u = if (rnd.nextInt(7) == 0) None else Some(rnd.nextDouble() * 10)
      (ent.toLong, day.toLong, v, u, rnd.nextInt(1000).toLong)
    }
    rows.toDF("ent", "day", "v", "u", "lv").cache()
  }

  private val W = Window.partitionBy("ent").orderBy("day")
  private def t(d: Int) = W.rowsBetween(-(d - 1), 0)
  private val run = W.rowsBetween(Window.unboundedPreceding, Window.currentRow)

  /** Every supported shape in one frame-decorated projection. */
  private def decorated(df: DataFrame): DataFrame = df
    .withColumn("s5", sum(col("v")).over(t(5)))
    .withColumn("s1", sum(col("v")).over(t(1)))
    .withColumn("sl", sum(col("lv")).over(t(7)))
    .withColumn("srun", sum(col("v")).over(run))
    .withColumn("a4", avg(col("u")).over(t(4)))
    .withColumn("a9", avg(col("v")).over(t(9)))
    .withColumn("mn6", min(col("v")).over(t(6)))
    .withColumn("mx6", max(col("v")).over(t(6)))
    .withColumn("mnl", min(col("lv")).over(t(5)))
    .withColumn("mxl", max(col("lv")).over(t(5)))
    .withColumn("c3", count(lit(1)).over(t(3)))
    .withColumn("cv", count(col("v")).over(t(8)))
    .withColumn("sd5", stddev_samp(col("u")).over(t(5)))
    .withColumn("sd2", stddev_samp(col("v")).over(t(2)))
    .withColumn("lag1", lag(col("v"), 1).over(W))
    .withColumn("lag3", lag(col("lv"), 3).over(W))
    .withColumn("lead2", lead(col("v"), 2).over(W))
    .withColumn("dl", graft.ops.TsOps.decayLinear(col("u"), 4, W))
    .withColumn("cl", collect_list(col("v")).over(t(6)))

  private def collectBits(df: DataFrame): Array[String] =
    df.orderBy("ent", "day")
      .collect()
      .map(r => (0 until r.length).map { i =>
        if (r.isNullAt(i)) "null"
        else r.get(i) match {
          case d: Double => java.lang.Double.doubleToRawLongBits(d).toString
          case s: Seq[_] => s.map {
            case d: Double => java.lang.Double.doubleToRawLongBits(d).toString
            case o => String.valueOf(o)
          }.mkString("[", ",", "]")
          case o => String.valueOf(o)
        }
      }.mkString("|"))

  test("TsWindow lowers the supported TS shape (plan pin) and WindowExec on fallback") {
    val plan = decorated(panel).queryExecution.executedPlan.toString
    assert(plan.contains("TsWindow"), s"expected TsWindowExec in:\n$plan")
    assert(!plan.contains("+- Window "), s"expected no WindowExec in:\n$plan")
    spark.conf.set("spark.graft.tsWindow", "window")
    try {
      val fb = decorated(panel).queryExecution.executedPlan.toString
      assert(!fb.contains("TsWindow"), s"fallback still lowered:\n$fb")
    } finally spark.conf.unset("spark.graft.tsWindow")
  }

  test("TsWindow is bit-identical to WindowExec across every supported function") {
    val viaNode = collectBits(decorated(panel))
    spark.conf.set("spark.graft.tsWindow", "window")
    val viaSpark =
      try collectBits(decorated(panel))
      finally spark.conf.unset("spark.graft.tsWindow")
    assert(viaNode.length == viaSpark.length)
    viaNode.zip(viaSpark).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a == b, s"row $i diverged:\n node: $a\nspark: $b")
    }
  }

  test("unsupported shapes fall back per operator") {
    // range frame + rank function + partition-only spec: all must
    // keep Spark's WindowExec even with the strategy installed
    val df = panel
      .withColumn("rk", rank().over(W))
      .withColumn("pr", sum(col("v")).over(Window.partitionBy("ent")))
      .withColumn("rg", count(lit(1)).over(
        W.orderBy(col("v")).rangeBetween(Window.currentRow, Window.currentRow)))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Window "), s"expected WindowExec in:\n$plan")
    // and the mixed chain still computes (smoke)
    assert(df.count() == panel.count())
  }
}
