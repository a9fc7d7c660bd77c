package graft.tools

import org.apache.spark.sql.functions._

/** One side of the two-PROCESS mart-publication race test (r17
  * verdict ask #8): `tools/mart_race.sh` launches two of these
  * simultaneously against the SAME persistent mart root — separate
  * JVMs, separate SparkSessions, zero shared memory — so the
  * temp-sibling + ATOMIC_MOVE winner/loser protocol in
  * `FactorQueries.buildMartAt` is exercised across real process
  * boundaries, not just the single-JVM path FactorMartSpec covers.
  *
  * The probe builds (or reuses) the value-family mart, then reads
  * the published path END TO END and prints a full-content checksum:
  * two probes that raced must agree on path, row count and checksum
  * (no partial read — a torn mart cannot checksum equal), and both
  * must find the manifest valid afterwards. `preValid` distinguishes
  * a true raced build from a degenerate run where one probe started
  * late and took the reuse fast path.
  *
  * The dataset under race is the optional third argument (any
  * `MartDataset.name` — default `value`): the ALPHA mart is the
  * expensive one where a raced double-build hurts most (r18 verdict
  * ask #7), and its multi-second derive also widens the race window
  * the most. */
object MartRaceProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: MartRaceProbe <martRoot> <sourceDir> [dataset]")
    val root = args(0); val dir = args(1)
    val dsName = if (args.length >= 3) args(2) else "value"
    val spark = graft.LocalSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ds = graft.analytics.FactorQueries.martDatasets
      .find(_.name == dsName)
      .getOrElse(throw new IllegalArgumentException(
        s"unknown dataset $dsName; one of " +
          graft.analytics.FactorQueries.martDatasets.map(_.name).mkString(",")))
    val target = graft.analytics.FactorQueries.martPathFor(root, dir, ds)
    val pre = graft.analytics.FactorQueries.martValid(spark, target, ds, dir)
    val t0 = System.nanoTime()
    val p = graft.analytics.FactorQueries.buildMartAt(spark, dir, ds, Some(root))
    val secs = (System.nanoTime() - t0) / 1e9
    val mart = spark.read.parquet(p)
    val cols = mart.schema.fieldNames.filterNot(_ == "yr").map(col)
    // bit_xor, not sum: ANSI mode throws on long overflow, and rows
    // are unique by (stock, day) so xor cancellation can't mask a diff
    val agg = mart.select(
      count(lit(1)).as("n"),
      bit_xor(xxhash64(cols: _*)).as("h")).head()
    val post = graft.analytics.FactorQueries.martValid(spark, p, ds, dir)
    println(s"RACE pid=${ProcessHandle.current.pid} preValid=$pre " +
      f"secs=$secs%.1f path=$p rows=${agg.getLong(0)} " +
      s"checksum=${agg.getLong(1)} postValid=$post")
    spark.stop()
    if (!post) sys.exit(1)
  }
}
