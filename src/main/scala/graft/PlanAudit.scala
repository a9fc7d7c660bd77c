package graft

import org.apache.spark.sql.SparkSession

/** Plan audit over every driver entry (builder tooling): executes
  * each query at a tiny SF and prints its shuffle/sort/broadcast
  * operator counts, so plan regressions (a new exchange, a lost
  * broadcast) surface as a diff in one table. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = LocalSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.collect() // finalize AQE
        val plan = df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==")(0)
        def n(p: String) = plan.linesIterator.count(l =>
          l.contains(p) && !l.contains("ReusedExchange"))
        println(f"AUDIT $name%-28s ex=${n("Exchange hashpartitioning")}%2d " +
          f"range=${n("Exchange rangepartitioning")}%2d single=${n("Exchange SinglePartition")}%2d " +
          f"bcast=${n("BroadcastExchange")}%2d smj=${n("SortMergeJoin")}%2d win=${n("Window")}%3d " +
          f"mrank=${n("MultiRank [")}%2d cart=${n("CartesianProduct")}%2d")
      } catch {
        case e: Exception => println(s"AUDIT $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
