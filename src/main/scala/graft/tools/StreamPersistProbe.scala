package graft.tools

/** One session of the persistent streamed-store test (r19 verdict
  * ask #8): `tools/stream_persist.sh` runs two of these SEQUENTIALLY
  * against one persistent root — separate JVMs, so the second run is
  * a genuinely new session. Session 1 finds no valid store and
  * builds it (scaffold + historical mart + manifest), then streams
  * the replay files on the store's own checkpoint. Session 2 must
  * VALIDATE the manifest and REUSE the store (preValid=true, no
  * rebuild), run the nightly maintenance on it — fold a planted
  * fragmented aged partition, retire first-bar snapshots — and its
  * AvailableNow pass on the SAME checkpoint must no-op (all replay
  * files already committed). Both sessions print row count and a
  * full-content checksum: they must AGREE — reuse and maintenance
  * must never move a value — and both must find the manifest valid
  * afterwards. The probe body lives in
  * `FactorQueries.streamPersistProbeRun` (it composes
  * package-private scaffold pieces). */
object StreamPersistProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: StreamPersistProbe <root> <sourceDir>")
    val spark = graft.LocalSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val line = graft.analytics.FactorQueries
      .streamPersistProbeRun(spark, args(0), args(1))
    println(line)
    spark.stop()
    if (!line.contains("postValid=true")) sys.exit(1)
  }
}
