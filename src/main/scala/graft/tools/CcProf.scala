package graft.tools

import org.apache.spark.sql.functions._

/** Ad-hoc profiler for the q102 derivation: splits the wall between
  * candidate mining (jaccardPrefixPairs) and the CC kernel, twice, so
  * first-call JVM/codegen warmup is separable from steady state. */
object CcProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.LocalSession.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.{DedupFns, TextFns}
    def once(tag: String): Unit = {
      val t0 = System.nanoTime()
      val d = graft.Tables.load(spark, dir, "documents")
        .repartition(32, col("doc_id")).localCheckpoint()
      val sh = d.select(col("doc_id"), col("source"),
        TextFns.charShinglesPacked(col("text")).as("sh"))
      val edges = DedupFns.jaccardPrefixPairs(sh, "doc_id", "source", "sh", threshold = 0.5)
        .select(col("id_a").as("src"), col("id_b").as("dst"))
        .localCheckpoint()
      val nEdges = edges.count()
      val t1 = System.nanoTime()
      val cc = graft.ops.GraphOps.connectedComponents(
        d.select(col("doc_id").as("id")), edges)
      val nComp = cc.select("comp").distinct().count()
      val t2 = System.nanoTime()
      println(f"[$tag] mining ${(t1 - t0) / 1e9}%.2f s ($nEdges edges), " +
        f"cc ${(t2 - t1) / 1e9}%.2f s ($nComp components)")
    }
    once("cold")
    once("warm")
    spark.stop()
  }
}
