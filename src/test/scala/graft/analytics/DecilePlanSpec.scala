package graft.analytics

import graft.SparkSpec

/** Pins the decileStats exchange-reuse invariant: the pid-count
  * branch and the row branch must observe ONE physical range
  * exchange (range boundaries are sampled per materialization, so a
  * second exchange could disagree with the first). */
class DecilePlanSpec extends SparkSpec {
  test("decileStats executes exactly one rangepartitioning exchange") {
    val df = RelationalQueries.decileStats(spark, "/root/testdata/sf0.001")
    df.collect() // finalize the adaptive plan
    // AQE's toString appends the pre-reuse "Initial Plan" — judge the
    // Final Plan only. The data exchange ranges on (o_totalprice,
    // o_orderkey); sort-order exchanges on `decile` and the
    // ReusedExchange reference lines don't count.
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val ranges = plan.linesIterator.count(l =>
      l.contains("Exchange rangepartitioning(o_totalprice")
        && !l.contains("ReusedExchange"))
    val reused = plan.linesIterator.count(_.contains("ReusedExchange"))
    assert(ranges == 1, s"expected 1 range exchange, got $ranges:\n$plan")
    assert(reused >= 1, s"expected ReusedExchange for the count branch:\n$plan")
  }

  test("decileStats matches a single-window ntile on small data") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val o = graft.Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val expect = o
      .withColumn("decile",
        ntile(10).over(Window.orderBy("o_totalprice", "o_orderkey")))
      .groupBy("decile").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val got = RelationalQueries.decileStats(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == expect)
  }
}
