package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Drives the streaming operators end-to-end with MemoryStream:
  * multi-micro-batch EMA state carry-over and watermarked window
  * aggregation. */
class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  test("emaStream: state carries the recursion across micro-batches") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, Long, Double)]
    val q = StreamOps.emaStream(in.toDS(), alpha = 0.5)
      .writeStream.format("memory").queryName("ema_out")
      .outputMode("append").start()
    try {
      in.addData((1L, 1L, 10.0), (1L, 2L, 20.0), (2L, 1L, 100.0))
      q.processAllAvailable()
      in.addData((1L, 3L, 30.0), (2L, 2L, 50.0)) // second batch: state resumes
      q.processAllAvailable()
      val out = spark.table("ema_out")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      // key 1: 10 -> .5*20+.5*10=15 -> .5*30+.5*15=22.5 (batch 2 resumed 15)
      assert(out((1L, 1L)) == 10.0 && out((1L, 2L)) == 15.0 && out((1L, 3L)) == 22.5)
      // key 2: 100 -> .5*50+.5*100=75
      assert(out((2L, 1L)) == 100.0 && out((2L, 2L)) == 75.0)
    } finally q.stop()
  }

  test("hourlyCounts: watermarked tumbling window aggregation") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val df = in.toDF().toDF("ts", "event_type", "value")
    val q = StreamOps.hourlyCounts(df)
      .writeStream.format("memory").queryName("hourly_out")
      .outputMode("complete").start()
    try {
      in.addData(
        (Timestamp.valueOf("2024-01-01 10:15:00"), "a", 1.5),
        (Timestamp.valueOf("2024-01-01 10:45:00"), "a", 2.5),
        (Timestamp.valueOf("2024-01-01 11:05:00"), "b", 4.0))
      q.processAllAvailable()
      val out = spark.table("hourly_out")
        .select(date_format(col("hour"), "HH").as("h"), col("event_type"),
          col("n"), col("sum_value"))
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
      assert(out(("10", "a")) == (2L, 4.0))
      assert(out(("11", "b")) == (1L, 4.0))
    } finally q.stop()
  }

  // in-Spark parity pins for the streaming ENTRIES (independent of
  // the DuckDB oracle): streamed == batch on the same session

  test("q114 parity: streamed hourly == batch agg on closed windows") {
    val sf = "/root/testdata/sf0.001"
    val streamed = StreamQueries.streamedHourly(spark, sf)
      .select(col("hour"), col("event_type"), col("n"), col("sum_value"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val ev = graft.Tables.load(spark, sf, "events")
    val wmMs = ev.agg(max(col("ts"))).head().getTimestamp(0).getTime - 2 * 3600 * 1000
    val batch = ev
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .filter(unix_millis(col("hour")) + 3600 * 1000 <= wmMs)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("q116 parity: overlapping redelivery deduped to the distinct source set") {
    val sf = "/root/testdata/sf0.001"
    val streamed = StreamQueries.streamedDedup(spark, sf)
    val total = streamed.count()
    val src = graft.Tables.load(spark, sf, "events").count()
    assert(total == src) // every source row exactly once
    assert(streamed.select("event_id").distinct().count() == src)
  }
}
