package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ingest-path profiler (builder tooling): splits the bulk-load
  * benchmark into parse-only and parse+sink phases so the bottleneck
  * is attributable. */
object IngestProf {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // AQE coalescing floor: the panel exchange shuffles only the
      // narrow key columns (~1.6 MB at sf0.1), but feeds hundreds of
      // derived-column windows — the default 1 MB floor coalesces it
      // to ~5 partitions and strangles compute parallelism
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16k")
      // the JVM-wide generated-class cache defaults to 100 entries;
      // a multi-query session evicts everything before the ~450-
      // projection alpha pipeline runs, recompiling per task
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      // constraint propagation is O(plan-size^2)-ish on the ~500-
      // projection alpha DAG and infers nothing the panel queries
      // need (no join pruning hinges on inferred IsNotNull here):
      // measured -25% on isolated q90 (149->111 s) and q58 (90->69 s)
      // at sf0.1 with identical results
      .config("spark.sql.constraintPropagation.enabled", "false")
      // the shared full-panel alpha frame (~500 double cols) is the
      // only large persisted frame; building its columnar cache with
      // per-column compression cost +40 s at sf0.1 (174 -> 135 s
      // isolated q58) for memory we don't need back — the frame is
      // ~400 MB raw against an 8 GB heap
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
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
