package graft.plans

import graft.SparkSpec
import graft.ops.{PlanOps, XsOps}
import org.apache.spark.sql.functions._

import scala.util.Random

/** Parity + plan pins for the batched cross-sectional rank operator:
  * [[MultiRankNode]] must be bit-identical to the WindowExec
  * formulation ([[XsOps.rankPct]]) it replaces — including average
  * ties, null exclusion, -0.0/0.0 merging, NaN-largest ordering, and
  * integral inputs — while eliminating the per-rank Sort operators. */
class MultiRankSpec extends SparkSpec {
  import spark.implicits._

  /** Random panel with nulls, exact ties, ±0.0, NaN, and a long col. */
  private lazy val panel = {
    val rnd = new Random(42)
    val rows = for {
      day <- 1 to 13
      ent <- 1 to 37
    } yield {
      val v1 = rnd.nextInt(8) match {
        case 0 => None
        case 1 => Some(0.0)
        case 2 => Some(-0.0)
        case 3 => Some(Double.NaN)
        case 4 => Some(rnd.nextInt(4).toDouble) // planted ties
        case _ => Some(rnd.nextDouble() * 100 - 50)
      }
      val v2 = if (rnd.nextInt(10) == 0) None else Some(rnd.nextDouble())
      (day.toLong, ent.toLong, v1, v2, rnd.nextInt(5).toLong)
    }
    rows.toDF("day", "ent", "v1", "v2", "lv").cache()
  }

  private def viaExec = {
    val rk = new PlanOps.RankRecorder("day")
    PlanOps.ColChain(panel, rec = Some(rk))
      .withRank("r1", col("v1"))
      .withRank("r2", col("v2"))
      .withRank("rl", col("lv"))
      .withRank("rr", col("r1")) // rank-of-rank, same stage
      .withRank("re", col("v1") * 2.0 - col("v2")) // hoisted input
      .build
  }

  private def viaWindow =
    panel
      .withColumn("r1", XsOps.rankPct(col("v1"), col("day")))
      .withColumn("r2", XsOps.rankPct(col("v2"), col("day")))
      .withColumn("rl", XsOps.rankPct(col("lv"), col("day")))
      .withColumn("rr", XsOps.rankPct(
        XsOps.rankPct(col("v1"), col("day")), col("day")))
      .withColumn("re", XsOps.rankPct(col("v1") * 2.0 - col("v2"), col("day")))

  test("MultiRank is bit-identical to the window formulation") {
    val cols = Seq("day", "ent", "r1", "r2", "rl", "rr", "re")
    val a = viaExec.select(cols.map(col): _*).orderBy("day", "ent").collect()
    val b = viaWindow.select(cols.map(col): _*).orderBy("day", "ent").collect()
    assert(a.length == b.length && a.length == 13 * 37)
    a.zip(b).foreach { case (x, y) =>
      cols.indices.foreach { i =>
        assert(x.isNullAt(i) == y.isNullAt(i), s"null mismatch at $i: $x vs $y")
        if (!x.isNullAt(i)) x.get(i) match {
          case d: Double =>
            val e = y.getDouble(i)
            // bit-identical, NaN-safe
            assert(java.lang.Double.doubleToLongBits(d)
              == java.lang.Double.doubleToLongBits(e), s"col $i: $d vs $e")
          case v => assert(v == y.get(i))
        }
      }
    }
  }

  test("rank plan: one MultiRank stage, no per-rank Sorts, no extra exchange") {
    val df = viaExec
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val mr = plan.linesIterator.count(_.contains("MultiRank ["))
    val sortLines = plan.linesIterator.count(_.contains("Sort ["))
    val ex = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange"))
    // the five ranks (incl. a rank-of-rank chain) lower to at most two
    // group passes on ONE day exchange with ONE single-key sort
    assert(mr >= 1 && mr <= 2, plan)
    assert(ex == 1, plan)
    assert(sortLines <= 1, plan)
  }

  test("spill path: rank groups larger than the in-memory buffer threshold") {
    // force the spillable buffer past its in-memory threshold (the
    // 100TB-scale path: a day group bigger than the window buffer)
    // and pin value parity against the in-memory run
    val key = "spark.sql.windowExec.buffer.in.memory.threshold"
    val prev = spark.conf.get(key)
    try {
      val expect = viaExec.select("day", "ent", "r1", "r2", "rr")
        .orderBy("day", "ent").collect()
      spark.conf.set(key, "4") // groups are 37 rows -> guaranteed spill-array path
      val got = viaExec.select("day", "ent", "r1", "r2", "rr")
        .orderBy("day", "ent").collect()
      assert(got.length == expect.length)
      got.zip(expect).foreach { case (a, b) => assert(a == b, s"$a vs $b") }
    } finally spark.conf.set(key, prev)
  }

  test("many ranks x large group under a tiny buffer threshold (memory-bound path)") {
    // the 100TB-shape plant for the per-group memory note: ONE group
    // far over the in-memory buffer threshold (spilled row buffer)
    // carrying 100 rank columns — exercises the in-place gather/rank
    // reuse and the 32-rank stage split (PlanOps.RankStageCap) at
    // once, pinned for value parity against the window formulation
    val key = "spark.sql.windowExec.buffer.in.memory.threshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "4")
      val rnd = new Random(7)
      val big = (1 to 3000).map { i =>
        (1L, i.toLong, rnd.nextDouble() * 100 - 50, rnd.nextInt(7).toDouble)
      }.toDF("day", "ent", "a", "b")
      val defs = (0 until 100).map { j =>
        val in = if (j == 0) "a" else if (j % 3 == 0) s"r${j - 1}" // rank-of-rank across splits
          else if (j % 2 == 0) "a" else "b"
        (s"r$j", in, j % 4 != 0) // mixed pct / raw modes
      }
      val got = PlanOps.multiRank(big, Seq("day"), defs)
      // >= 4 MultiRank stages (100 ranks / 32 cap) and still no extra exchange
      got.collect()
      val plan = got.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert(plan.linesIterator.count(_.contains("MultiRank [")) >= 4, plan)
      assert(plan.linesIterator.count(l =>
        l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange")) == 1, plan)
      // value parity on a sample of ranks spanning chunk boundaries
      val sample = Seq("r0", "r31", "r32", "r33", "r63", "r99")
      val win = defs.foldLeft(big) { case (d, (n, in, pct)) =>
        d.withColumn(n,
          if (pct) XsOps.rankPct(col(in), col("day"))
          else XsOps.avgRank(col(in), col("day")))
      }
      val a = got.select(("ent" +: sample).map(col): _*).orderBy("ent").collect()
      val b = win.select(("ent" +: sample).map(col): _*).orderBy("ent").collect()
      assert(a.length == 3000)
      a.zip(b).foreach { case (x, y) => assert(x == y, s"$x vs $y") }
    } finally spark.conf.set(key, prev)
  }

  test("composite keys + raw avg-tie mode == XsOps.avgRank windows, bitwise") {
    // the q91 shape: rank within (day, group) cross-sections, raw
    // average-tie rank (no pct division)
    val df = panel.filter(col("v1").isNotNull && col("v2").isNotNull)
      .withColumn("g", col("ent") % 3)
    val viaNode = PlanOps.multiRank(df, Seq("day", "g"),
      Seq(("rv", "v1", false), ("rf", "v2", false)))
    val viaWin = df
      .withColumn("rv", XsOps.avgRank(col("v1"), col("day"), col("g")))
      .withColumn("rf", XsOps.avgRank(col("v2"), col("day"), col("g")))
    val a = viaNode.select("day", "ent", "rv", "rf").orderBy("day", "ent").collect()
    val b = viaWin.select("day", "ent", "rv", "rf").orderBy("day", "ent").collect()
    assert(a.length == b.length && a.nonEmpty)
    a.zip(b).foreach { case (x, y) =>
      (2 to 3).foreach { i =>
        assert(java.lang.Double.doubleToLongBits(x.getDouble(i))
          == java.lang.Double.doubleToLongBits(y.getDouble(i)), s"$x vs $y")
      }
    }
  }

  test("raw avg-tie mode on NULL-bearing input: documented divergence from avgRank") {
    // PlanOps.multiRank doc: pct=false emits null for null inputs and
    // ranks non-nulls from 1; XsOps.avgRank's window (default nulls
    // FIRST) gives nulls real ranks and shifts non-nulls up. Pin BOTH
    // on a hand-checked group so the divergence stays documented-and-
    // tested instead of latent (round-10 advice #1).
    // day 1: [null, 5.0, 5.0, 9.0]
    val df = Seq((1L, 1L, None), (1L, 2L, Some(5.0)), (1L, 3L, Some(5.0)),
      (1L, 4L, Some(9.0))).toDF("day", "ent", "v")
    val node = PlanOps.multiRank(df, Seq("day"), Seq(("r", "v", false)))
      .orderBy("ent").select("r").collect()
    assert(node(0).isNullAt(0)) // null input -> null rank
    assert(node(1).getDouble(0) == 1.5 && node(2).getDouble(0) == 1.5)
    assert(node(3).getDouble(0) == 3.0)
    val win = df.withColumn("r", XsOps.avgRank(col("v"), col("day")))
      .orderBy("ent").select("r").collect()
    assert(win(0).getDouble(0) == 1.0) // null ranked FIRST, a real rank
    assert(win(1).getDouble(0) == 2.5 && win(2).getDouble(0) == 2.5)
    assert(win(3).getDouble(0) == 4.0) // non-nulls shifted by the null count
  }

  test("pandas tie/null semantics on a hand-checked group") {
    // day 1: values [10, 10, null, 30] -> nonnull n=3
    // ranks: 10 -> (1 + (2-1)/2)/3 = 0.5 ; 30 -> 3/3 = 1.0
    val df = Seq((1L, 1L, Some(10.0)), (1L, 2L, Some(10.0)),
      (1L, 3L, None), (1L, 4L, Some(30.0)))
      .toDF("day", "ent", "v")
    val rk = new PlanOps.RankRecorder("day")
    val out = PlanOps.ColChain(df, rec = Some(rk)).withRank("r", col("v")).build
      .orderBy("ent").select("r").collect()
    assert(out(0).getDouble(0) == 0.5)
    assert(out(1).getDouble(0) == 0.5)
    assert(out(2).isNullAt(0))
    assert(out(3).getDouble(0) == 1.0)
  }
}
