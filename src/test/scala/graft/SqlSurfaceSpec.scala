package graft

/** The `spark.sql` surface ([[Tables.registerAll]]): the reference's
  * users speak SQL (ClickHouse console / client queries), so the
  * engine registers every base table plus the derived `quotes` panel
  * as views and answers plain SQL with full pushdown intact. */
class SqlSurfaceSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("base tables and quotes panel answer plain SQL") {
    Tables.registerAll(spark, sf)
    val n = spark.sql(
      "SELECT count(*) AS n FROM lineitem WHERE l_quantity > 25")
      .collect()(0).getAs[Long]("n")
    assert(n > 0)
    val q = spark.sql(
      """SELECT stock, max(day) AS days, round(avg(close), 4) AS avg_close
        |FROM quotes WHERE stock <= 5 GROUP BY stock ORDER BY stock""".stripMargin)
      .collect()
    assert(q.nonEmpty && q.forall(_.getAs[Long]("days") > 0))
  }

  test("SQL over a registered view keeps filter pushdown") {
    Tables.registerAll(spark, sf)
    val plan = spark.sql(
      "SELECT l_orderkey FROM lineitem WHERE l_shipdate >= DATE'1995-01-01'")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"expected pushed filter in:\n$plan")
  }
}
