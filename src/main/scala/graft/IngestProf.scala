package graft

import org.apache.spark.sql.functions._

/** Ingest-path profiler (builder tooling): splits the bulk-load
  * benchmark into parse-only and parse+sink phases so the bottleneck
  * is attributable. */
object IngestProf {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = LocalSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val perMember = sys.env.getOrElse("SPARK_GRAFT_INGEST_ROWS", "5000").toInt
    val root = TempDirs.scratch("graft_ingest_prof", preferShm = true)
    val t0 = System.nanoTime()
    val n = graft.analytics.IngestQueries.writeFixture(
      s"$root/zips", nZips = 32, rowsPerMember = perMember, nCodes = 32)
    val t1 = System.nanoTime()
    println(f"PROF fixture: ${(t1 - t0) / 1e9}%.1f s ($n rows)")
    val parsed = graft.sources.Ingest.readZippedCsv(spark, s"$root/zips/*.zip")
    println("PROF partitions: " + parsed.rdd.getNumPartitions)
    parsed.write.format("noop").mode("overwrite").save()
    val t2 = System.nanoTime()
    println(f"PROF parse-only: ${(t2 - t1) / 1e9}%.1f s -> ${n / ((t2 - t1) / 1e9)}%.0f rows/s")
    // stored tick schema only (matches Bench.measureIngest): the
    // baseline pipe never persists source paths
    val ticks = parsed.toDF()
      .withColumn("code", graft.sources.Ingest.normalizeCode(
        regexp_extract(col("src_file"), "(\\d+)", 1)))
      .select("code", "trade_time", "price", "volume", "direction")
    graft.sources.Ingest.writeSortedParquet(ticks, s"$root/out",
      partCols = Seq("code"), sortCols = Seq("trade_time"))
    val t3 = System.nanoTime()
    println(f"PROF parse+sink: ${(t3 - t2) / 1e9}%.1f s -> ${n / ((t3 - t2) / 1e9)}%.0f rows/s")
    spark.stop()
  }
}
