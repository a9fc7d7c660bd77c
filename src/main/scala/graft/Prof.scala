package graft

import org.apache.spark.sql.SparkSession

/** Plan-cost profiler for the Alpha101 mega-DAG: splits wall time
  * into analysis / optimization / physical planning / execution so
  * plan-size regressions are attributable (builder tooling, not a
  * driver surface). */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.wholeStage",
        sys.env.getOrElse("PROF_CODEGEN", "true"))
      .config("spark.sql.codegen.factoryMode",
        sys.env.getOrElse("PROF_FACTORY", "FALLBACK"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var t = System.nanoTime()
    def lap(label: String): Unit = {
      val now = System.nanoTime()
      println(f"PROF $label: ${(now - t) / 1e9}%.1f s")
      t = now
    }
    // PROF_QUERY=<entry name>: explain any SparkEntry query and exit
    sys.env.get("PROF_QUERY").foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.explain("formatted")
      spark.stop()
      return
    }
    val full = graft.factors.Alpha101.compute(graft.sources.Quotes.panel(spark, sfDir))
    val df = sys.env.get("PROF_SELECT") match {
      case Some(cols) =>
        full.select((Seq("stock", "day") ++ cols.split(",")).map(org.apache.spark.sql.functions.col): _*)
      case None => full
    }
    lap("build (analysis)")
    df.queryExecution.optimizedPlan
    lap("optimize")
    val exec = df.queryExecution.executedPlan
    lap("physical planning")
    println("PROF window ops: " + exec.toString.linesIterator.count(_.contains("Window")))
    println("PROF sort ops: " + exec.toString.linesIterator.count(l => l.contains("Sort ")))
    sys.env.get("PROF_PLAN_OUT").foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), exec.toString)
    }
    df.write.format("noop").mode("overwrite").save()
    lap("execute (cold)")
    df.write.format("noop").mode("overwrite").save()
    lap("execute (warm)")
    spark.stop()
  }
}
