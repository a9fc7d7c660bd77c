package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordering invariants of [[PlanOps.keyPhaseOrder]]: the scheduler
  * may permute definitions to cluster same-partition-key windows,
  * but every data dependency, anti-dependency (a reader may not slip
  * past a later redefinition of the name it reads), and definition-
  * order constraint must survive — and the result must be
  * deterministic. Violations here are silent wrong-answer bugs, not
  * crashes, so they get their own spec instead of riding the
  * end-to-end oracles. */
class PlanOpsSpec extends SparkSpec {

  private val wStock = Window.partitionBy("stock").orderBy("day")
  private val wDay = Window.partitionBy("day")

  private def ts(c: Column): Column = sum(c).over(wStock.rowsBetween(-2, 0))
  private def xs(c: Column): Column = sum(c).over(wDay)

  /** A chain exercising every edge type: scalar defs, TS/XS windows,
    * a redefinition of `v` with both earlier and later readers. */
  private val defs: Seq[(String, Column)] = Seq(
    "a" -> ts(col("x")), // stock
    "b" -> (col("a") + lit(1)), // scalar, reads a
    "readsOldV" -> (col("v") * 2), // reads ORIGINAL v
    "v" -> (col("v") + col("b")), // redefines v (reads old v and b)
    "readsNewV" -> xs(col("v")), // day; must see the NEW v
    "c" -> ts(col("readsNewV")), // stock again (forces an alternation)
    "d" -> xs(col("c")), // day
    "free" -> lit(42) // no deps at all
  )

  private def order(names: Seq[String]): Map[String, Int] =
    names.zipWithIndex.toMap

  test("keyPhaseOrder preserves data deps, anti-deps, and def order") {
    val out = PlanOps.keyPhaseOrder(defs).map(_._1)
    assert(out.sorted === defs.map(_._1).sorted) // a permutation
    val pos = order(out)
    // data deps
    assert(pos("b") > pos("a"))
    assert(pos("v") > pos("b"))
    assert(pos("readsNewV") > pos("v"))
    assert(pos("c") > pos("readsNewV"))
    assert(pos("d") > pos("c"))
    // anti-dep: the reader of the ORIGINAL v must not slip after the
    // redefinition
    assert(pos("readsOldV") < pos("v"))
  }

  test("keyPhaseOrder is deterministic") {
    val a = PlanOps.keyPhaseOrder(defs).map(_._1)
    val b = PlanOps.keyPhaseOrder(defs).map(_._1)
    assert(a === b)
  }

  test("keyPhaseOrder clusters same-key windows into fewer phases") {
    // alternation count of the window KINDS in emitted order must not
    // exceed the source order's (here: source alternates
    // stock,day,stock,day = 3 flips; the deps force at least
    // stock->day->stock->day too, so equality is fine — the point is
    // the scheduler never does WORSE)
    def flips(names: Seq[String]): Int = {
      val kind = Map("a" -> 1, "readsNewV" -> 2, "c" -> 1, "d" -> 2)
      val ks = names.flatMap(kind.get)
      ks.zip(ks.drop(1)).count { case (x, y) => x != y }
    }
    val out = PlanOps.keyPhaseOrder(defs).map(_._1)
    assert(flips(out) <= flips(defs.map(_._1)))
  }

  test("ColChain linearity guard: branching a recorder-backed chain fails fast") {
    import spark.implicits._
    val base = Seq((1L, 1L, 1.0)).toDF("stock", "day", "x")
    val rk = new PlanOps.RankRecorder("day")
    val c0 = PlanOps.ColChain(base, rec = Some(rk))
    val c1 = c0.withRank("r1", col("x"))
    // branching: extending the ALREADY-EXTENDED c0 again would attach
    // pending rank defs to the wrong branch — must fail, not misattach
    val ex = intercept[IllegalArgumentException](c0.withColumn("y", lit(1)))
    assert(ex.getMessage.contains("linearity"), ex.getMessage)
    // the linear continuation still works
    assert(c1.withColumn("y", col("r1") * 2).build.columns.contains("y"))
    // a fresh chain reusing the SAME (already-drained) recorder fails
    val ex2 = intercept[IllegalArgumentException](
      PlanOps.ColChain(base, rec = Some(rk)).withColumn("z", lit(1)))
    assert(ex2.getMessage.contains("linearity"), ex2.getMessage)
  }

  test("batched build equals sequential withColumn chain") {
    import spark.implicits._
    val base = Seq((1L, 1L, 1.0, 2.0), (1L, 2L, 2.0, 3.0), (2L, 1L, 3.0, 4.0))
      .toDF("stock", "day", "x", "v")
    val batched = PlanOps.withColumnsBatched(base, defs)
    val sequential = defs.foldLeft(base) { case (df, (n, c)) => df.withColumn(n, c) }
    assert(batched.columns.sorted.toSeq === sequential.columns.sorted.toSeq)
    // compare by NAME: the scheduler may emit new columns in a
    // different position, which is not an observable difference for
    // any consumer that selects by name
    val cols = sequential.columns.sorted.map(col)
    val l = batched.select(cols: _*).orderBy("stock", "day").collect().map(_.toSeq)
    val r = sequential.select(cols: _*).orderBy("stock", "day").collect().map(_.toSeq)
    assert(l.toSeq === r.toSeq)
  }
}
