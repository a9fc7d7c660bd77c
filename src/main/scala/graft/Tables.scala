package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Catalog of the driver-provided testdata tables (TESTDATA.md).
  *
  * Mirrors the reference's fixed-schema catalog (SURVEY.md §1.3): each
  * table is a parquet dataset loaded with its declared schema; queries
  * address tables by name. All loads are plain `spark.read.parquet` so
  * Catalyst keeps full pushdown/pruning freedom.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // mount the batched TS-window lowering wherever driver tables are
    // read (idempotent; the strategy falls back per-operator) — the
    // TS entries window over events/lineitem frames directly
    org.apache.spark.sql.graftbridge.PlanBridge.installStrategy(
      spark, graft.plans.TsWindowStrategy)
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark refuses by
      // default; read as long nanos and convert to a µs timestamp.
      // Integer `div` (not `/`): epoch nanos ≈ 1.7e18 exceeds double's
      // 2^53 exact-integer range.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      if (df.schema("ts").dataType == LongType)
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else df
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Register every table as a temp view so `spark.sql` works like
    * the reference's SQL console — plus the derived `quotes` panel
    * ([[graft.sources.Quotes.panel]]), the analog of the reference's
    * market-daily table surface. Views are lazy plans over the
    * parquet scans, so SQL queries keep full pushdown/pruning. */
  def registerAll(spark: SparkSession, sfDir: String): Unit = {
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
    graft.sources.Quotes.panel(spark, sfDir).createOrReplaceTempView("quotes")
  }
}
