package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query-name filter (builder
    // iteration aid; the driver always runs the full set)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(',').toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = LocalSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // oracle_sql.json is pure metadata — write it BEFORE the query
    // loop so a budget-expired partial run still yields rows for
    // every query that finished (round-4 verdict, What's-wrong #1a).
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // per-query watchdog: one hung/regressed query must cost its own
    // budget, not the whole gate's. Each query runs on a daemon
    // worker thread under a job group; on timeout the group's Spark
    // jobs are cancelled and the loop moves on. The slowest entry —
    // the first alpha consumer, which triggers the shared full-panel
    // derivation — is ~10 s at sf0.01 since the round-10/11 MultiRank
    // plan work (was ~90 s); 450 s keeps deep headroom so a contended
    // driver box (2.8x slowdowns observed round 7) can't turn a slow
    // entry into a missing row. Overridable for ad-hoc big-SF runs.
    val timeoutSec = sys.env.getOrElse("SPARK_GRAFT_VERIFY_TIMEOUT", "450").toLong
    // cached pool, daemon threads: a thread stuck in driver-side code
    // (where job cancellation can't reach) is abandoned and the next
    // query gets a fresh thread; daemons never block JVM exit
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(
        java.util.concurrent.Executors.newCachedThreadPool { r =>
          val t = new Thread(r, "verify-query"); t.setDaemon(true); t
        })
    // run cheap queries first (names sort the expensive q9x entries
    // last) so a budget expiry loses only the tail, not a random subset
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      // job group is a thread-LOCAL Spark property: it must be set on
      // the worker thread that submits the jobs (a cached-pool thread
      // reused across queries would otherwise carry a stale group and
      // cancelJobGroup(name) would cancel nothing)
      val fut = scala.concurrent.Future {
        spark.sparkContext.setJobGroup(name, name, interruptOnCancel = true)
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        finally spark.sparkContext.clearJobGroup()
      }
      try scala.concurrent.Await.result(fut,
        scala.concurrent.duration.Duration(timeoutSec, "s"))
      catch {
        case _: java.util.concurrent.TimeoutException =>
          spark.sparkContext.cancelJobGroup(name)
          System.err.println(s"[verify] $name TIMED OUT after ${timeoutSec}s — cancelled, moving on")
        case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getClass.getName}: ${e.getMessage}")
          e.getStackTrace.take(8).foreach(f => System.err.println(s"    at $f"))
      }
    }
    spark.stop()
  }
}
