package graft

import org.apache.spark.sql.functions._

/** Ingest-path profiler (builder tooling): splits the bulk-load
  * benchmark into parse-only and parse+sink phases so the bottleneck
  * is attributable.
  *
  * Default is the COLD single-shot (one pass through a fresh JVM —
  * understates steady state by ~2× per the r9 measurements: parse/
  * encoder codegen + C2 compilation ride the first pass).
  * `PROF_WARM=1` runs the steady-state protocol instead: one untimed
  * warmup pass, then `PROF_REPS` (default 3) timed repetitions of
  * both phases with every reading printed and the BEST kept — the
  * number a contended driver-box artifact should be read against
  * (r17 verdict ask #5; Bench's own best-of-2 is the in-run
  * approximation of the same idea). `PROF_MEDIUM=disk` moves the
  * fixture + sink off tmpfs for the disk-banded comparison. Each
  * line records the 1-min load at its start so an idle-box claim is
  * checkable from the output alone. */
object IngestProf {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = LocalSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val perMember = sys.env.getOrElse("SPARK_GRAFT_INGEST_ROWS", "5000").toInt
    val warm = sys.env.get("PROF_WARM").exists(_ == "1")
    val reps = sys.env.getOrElse("PROF_REPS", "3").toInt
    val preferShm = !sys.env.get("PROF_MEDIUM").contains("disk")
    val root = TempDirs.scratch("graft_ingest_prof", preferShm = preferShm)
    val medium = if (root.startsWith("/dev/shm")) "tmpfs" else "disk"
    val t0 = System.nanoTime()
    val n = graft.analytics.IngestQueries.writeFixture(
      s"$root/zips", nZips = 32, rowsPerMember = perMember, nCodes = 32)
    println(f"PROF fixture: ${(System.nanoTime() - t0) / 1e9}%.1f s ($n rows, $medium)")

    /** One full pass; returns (parse rows/s, parse+sink rows/s). The
      * parse+sink denominator is the SINK ACTION alone (t2..t3): its
      * lazy lineage re-runs the parse, so that window is one parse +
      * one sink — the same single-pass semantics Bench.measureIngest
      * times and BASELINE.md's 0.8–1.2 M band describes. Dividing by
      * the whole pass (noop parse + sink action) would charge two
      * parses and deflate the metric ~15%. One shared sink dir
      * (mode=overwrite) keeps warm mode from stacking a full-size
      * parquet copy per rep on tmpfs. */
    def pass(tag: String, timed: Boolean): (Double, Double) = {
      val load = Bench.load1
      val t1 = System.nanoTime()
      val parsed = graft.sources.Ingest.readZippedCsv(spark, s"$root/zips/*.zip")
      parsed.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      val parseRps = n / ((t2 - t1) / 1e9)
      // stored tick schema only (matches Bench.measureIngest): the
      // baseline pipe never persists source paths
      val ticks = parsed.toDF()
        .withColumn("code", graft.sources.Ingest.normalizeCode(
          regexp_extract(col("src_file"), "(\\d+)", 1)))
        .select("code", "trade_time", "price", "volume", "direction")
      graft.sources.Ingest.writeSortedParquet(ticks, s"$root/out",
        partCols = Seq("code"), sortCols = Seq("trade_time"))
      val t3 = System.nanoTime()
      val sinkRps = n / ((t3 - t2) / 1e9)
      if (timed)
        println(f"PROF $tag ($medium, load1=$load%.1f): parse-only ${(t2 - t1) / 1e9}%.1f s -> $parseRps%.0f rows/s; parse+sink ${(t3 - t2) / 1e9}%.1f s -> $sinkRps%.0f rows/s")
      (parseRps, sinkRps)
    }

    if (!warm) {
      val parsed = graft.sources.Ingest.readZippedCsv(spark, s"$root/zips/*.zip")
      println("PROF partitions: " + parsed.rdd.getNumPartitions)
      pass("cold", timed = true)
    } else {
      pass("warmup", timed = false)
      val runs = (1 to reps).map(i => pass(s"rep$i", timed = true))
      println(f"PROF best-of-$reps ($medium): parse-only ${runs.map(_._1).max}%.0f rows/s; parse+sink ${runs.map(_._2).max}%.0f rows/s")
    }
    spark.stop()
  }
}
