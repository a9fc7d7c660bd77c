package graft.analytics

/** Ad-hoc probe for q147's int8 code store: prints the coarse-probe
  * physical plan (must read ONLY the codes table), the on-disk byte
  * ratio of codes vs the float corpus, and the entry's recall@10. */
object Q147Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.LocalSession.builder("8").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val codes = CorpusQueries.buildInt8Store(spark, sf)
    val probe = CorpusQueries.int8Probe(spark, codes)
    probe.collect()
    println("PLAN>>>")
    println(probe.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0))
    val codeBytes = spark.table(codes).inputFiles
      .map(f => new java.io.File(new java.net.URI(f)).length).sum
    val embBytes = graft.Tables.load(spark, sf, "embeddings").inputFiles
      .map(f => new java.io.File(new java.net.URI(f)).length).sum
    println(s"BYTES codes=$codeBytes emb=$embBytes ratio=${codeBytes.toDouble / embBytes}")
    val rows = CorpusQueries.int8StoredAnn(spark, sf).collect()
    println("ROWS " + rows.length + " recall=" + rows.head.getDouble(5))
    spark.stop()
  }
}
