package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the as-of join semantics the q97 oracle checks against
  * DuckDB's native ASOF JOIN: latest right row with t <= left t,
  * same-time rows visible (ties), LEFT OUTER nulls before the first
  * snapshot — plus the one-exchange plan shape. */
class AsOfOpsSpec extends SparkSpec {
  import spark.implicits._

  test("asOfJoin: latest-at-or-before, ties visible, left-outer nulls") {
    val left = Seq((1L, 1L, "a"), (1L, 5L, "b"), (1L, 10L, "c"), (2L, 3L, "d"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 5L, 50.0), (1L, 8L, 80.0), (2L, 9L, 90.0))
      .toDF("k", "rt", "px")
    val out = AsOfOps.asOfJoin(left, right, Seq("k"), "t", "rt", Seq("px"))
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("t")) ->
        Option(r.getAs[Any]("px"))).toMap
    assert(out((1L, 1L)).isEmpty)          // before any snapshot -> null
    assert(out((1L, 5L)).contains(50.0))   // tie: same-time row visible
    assert(out((1L, 10L)).contains(80.0))  // latest at-or-before
    assert(out((2L, 3L)).isEmpty)          // key 2's snapshot is later
  }

  test("asOfJoin: single key-hash exchange") {
    val left = (1 to 100).map(i => (i % 5L, i.toLong, i * 1.0)).toDF("k", "t", "x")
    val right = (1 to 20).map(i => (i % 5L, i * 3L, i * 10.0)).toDF("k", "rt", "px")
    val df = AsOfOps.asOfJoin(left, right, Seq("k"), "t", "rt", Seq("px"))
    df.collect()
    val ex = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0).linesIterator
      .filter(l => l.contains("Exchange hashpartitioning") && !l.contains("Reused"))
      .toSeq
    assert(ex.size <= 1, ex.mkString("\n"))
  }
}
