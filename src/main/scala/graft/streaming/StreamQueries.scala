package graft.streaming


import graft.sources.Quotes
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType, TimestampType}

/** q95: the stateful streaming EMA (SURVEY.md §2.10) as a driver-
  * visible, FULLY ORACLED entry. A (stock, day, close) slice of the
  * quotes panel is written as three day-ranged parquet files; a file
  * stream replays them as three micro-batches (maxFilesPerTrigger=1,
  * oldest-first by modification time — the writes are sequential
  * jobs, so mod times strictly increase); [[StreamOps.emaStream]]
  * carries one Double of state per stock across the batches. The
  * entry returns the STREAMED values themselves: the slice derives
  * deterministically from the oracle-visible `events` parquet
  * ([[Quotes.sqlCte]]), and panel doubles are exactly representable,
  * so DuckDB replays the recursion bit-exactly with a recursive CTE
  * written in the same association order (`a*x + (1-a)*state`) —
  * the temp dir is only transport, not state. Streaming/batch parity
  * against [[graft.ops.TsOps.ema]] stays pinned in EntryShapeSpec.
  *
  * Scale: the streaming side is the real plan — file source →
  * stateful flatMapGroupsWithState keyed on the entity id; the only
  * scale-variant piece is the state store, O(1) per key.
  */
object StreamQueries {
  private type Q = (SparkSession, String) => DataFrame

  val emaAlpha: Double = 2.0 / (12 + 1)

  /** The deterministic stream input slice (shared with the parity
    * spec): ~20 stocks of the panel, one row per (stock, day). */
  def emaSlice(s: SparkSession, dir: String): DataFrame =
    Quotes.panel(s, dir)
      .filter(col("stock") <= 20)
      .select(col("stock").cast("long").as("stock"), col("day"), col("close"))

  /** Runs the file-stream replay and returns the raw streamed frame
    * (stock, day, ema_stream). */
  def streamedEma(s: SparkSession, dir: String): DataFrame = {
    val root = graft.TempDirs.scratch("graft_stream")
    val slice = emaSlice(s, dir)
    // three sequential writes = three files with increasing mod time
    // = three micro-batches in day order (per-key event time must be
    // monotone across batches for exact replay, StreamOps.emaStream)
    Seq((lit(1), 22), (lit(23), 44), (lit(45), Int.MaxValue)).zipWithIndex
      .foreach { case ((lo, hi), i) =>
        slice.filter(col("day") >= lo && col("day") <= hi)
          .coalesce(1).write.parquet(s"$root/in/b$i")
      }
    val schema = StructType(Seq(StructField("stock", LongType),
      StructField("day", LongType), StructField("close", DoubleType)))
    import s.implicits._
    val streamIn = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$root/in/*")
      .as[(Long, Long, Double)]
    // unique sink name: the entry may run more than once per session
    // (spec + verify share a JVM in local runs)
    val sink = s"q95_ema_out_${java.lang.Long.toHexString(root.hashCode.toLong & 0xffffffffL)}"
    val q = StreamOps.emaStream(streamIn, emaAlpha)
      .toDF("stock", "day", "ema_stream")
      .writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", s"$root/ckpt")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(sink)
  }

  def emaStreamValues: Q = (s, dir) => {
    val fr6 = (c: org.apache.spark.sql.Column) => floor(c * 1e6 + lit(0.5)) / 1e6
    streamedEma(s, dir)
      .select(col("stock"), col("day"), fr6(col("ema_stream")).as("ema"))
      .orderBy("stock", "day")
  }

  /** q114: the OTHER streaming surface (SURVEY.md §2.10) as a fully
    * oracled entry — tumbling event-time windows with a 2h watermark
    * ([[StreamOps.hourlyCounts]]), replayed over the `events` table
    * as a 3-micro-batch file stream. The batches are range-split by
    * thirds of [min ts, max ts], so event time is nondecreasing
    * across batches: the watermark only moves forward and NO row is
    * ever late — streamed output is exactly the batch aggregation
    * restricted to CLOSED windows (end ≤ final watermark = ms-floored
    * max event time − 2h), which is what the DuckDB oracle computes.
    * Append mode means open windows are retained state, never
    * emitted — the correct production semantics for a live feed.
    *
    * Scale: file source → watermarked window agg is the real plan;
    * state is one row per (open window, type), bounded by the
    * watermark horizon. */
  def streamedHourly(s: SparkSession, dir: String): DataFrame = {
    val root = graft.TempDirs.scratch("graft_stream_hourly")
    val ev = graft.Tables.load(s, dir, "events")
      .select(col("ts"), col("event_type"), col("value"))
    // fixture transport (2 scalars for the split bounds), not result
    // materialization
    val mm = ev.agg(min(col("ts")).as("lo"), max(col("ts")).as("hi")).head()
    val (lo, hi) = (mm.getTimestamp(0).getTime, mm.getTimestamp(1).getTime)
    val b1 = new java.sql.Timestamp(lo + (hi - lo) / 3)
    val b2 = new java.sql.Timestamp(lo + 2 * ((hi - lo) / 3))
    Seq(col("ts") < lit(b1),
        col("ts") >= lit(b1) && col("ts") < lit(b2),
        col("ts") >= lit(b2))
      .zipWithIndex.foreach { case (cond, i) =>
        ev.filter(cond).coalesce(1).write.parquet(s"$root/in/b$i")
      }
    val schema = StructType(Seq(StructField("ts", TimestampType),
      StructField("event_type", StringType), StructField("value", DoubleType)))
    val streamIn = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$root/in/*")
    val sink = s"q114_hourly_${java.lang.Long.toHexString(root.hashCode.toLong & 0xffffffffL)}"
    val q = StreamOps.hourlyCounts(streamIn)
      .writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", s"$root/ckpt")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(sink)
  }

  def hourlyStreamValues: Q = (s, dir) =>
    streamedHourly(s, dir)
      .select(date_format(col("hour"), "yyyy-MM-dd HH:mm").as("hour"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("hour", "event_type")

  /** q116: streaming exactly-once dedup — `dropDuplicates(event_id)`
    * under a 48h watermark, replayed over a file stream whose batches
    * OVERLAP by ~a day (each batch redelivers the tail of the
    * previous range — the at-least-once delivery a real source
    * produces). The dedup state absorbs every redelivered row (the
    * overlap is far inside the watermark lag, so no key is evicted
    * before its duplicate arrives), so the streamed set is exactly
    * the distinct source set and the entry's per-type rollup equals
    * the batch aggregation the DuckDB oracle runs. Completes the
    * streaming tier: stateful recursion (q95), watermarked windows
    * (q114), dedup-on-the-wire (q116).
    *
    * Scale: state is one key per in-flight event id bounded by the
    * watermark horizon; the rollup is a normal shuffle agg. */
  def streamedDedup(s: SparkSession, dir: String): DataFrame = {
    val root = graft.TempDirs.scratch("graft_stream_dedup")
    val ev = graft.Tables.load(s, dir, "events")
      .select(col("ts"), col("event_id"), col("event_type"),
        col("user_id"), col("value"))
    val mm = ev.agg(min(col("ts")).as("lo"), max(col("ts")).as("hi")).head()
    val (lo, hi) = (mm.getTimestamp(0).getTime, mm.getTimestamp(1).getTime)
    val third = (hi - lo) / 3
    val ovMs = 24L * 3600 * 1000
    def t(ms: Long) = new java.sql.Timestamp(ms)
    // [lo, b1+ov) ∪ [b1, b2+ov) ∪ [b2, hi]: max event time still
    // nondecreasing across batches, every batch after the first
    // redelivers the previous day's rows
    Seq(col("ts") < lit(t(lo + third + ovMs)),
        col("ts") >= lit(t(lo + third)) && col("ts") < lit(t(lo + 2 * third + ovMs)),
        col("ts") >= lit(t(lo + 2 * third)))
      .zipWithIndex.foreach { case (cond, i) =>
        ev.filter(cond).coalesce(1).write.parquet(s"$root/in/b$i")
      }
    val schema = StructType(Seq(StructField("ts", TimestampType),
      StructField("event_id", LongType), StructField("event_type", StringType),
      StructField("user_id", LongType), StructField("value", DoubleType)))
    val streamIn = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$root/in/*")
    val sink = s"q116_dedup_${java.lang.Long.toHexString(root.hashCode.toLong & 0xffffffffL)}"
    val q = streamIn
      .withWatermark("ts", "48 hours")
      .dropDuplicates("event_id")
      .writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", s"$root/ckpt")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(sink)
  }

  def dedupStreamValues: Q = (s, dir) =>
    streamedDedup(s, dir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        countDistinct("user_id").as("n_users"),
        round(sum("value"), 2).as("sum_value"))
      .orderBy("event_type")

  val entries: Map[String, Q] = Map(
    "q95_ema_stream_parity" -> emaStreamValues,
    "q114_stream_hourly" -> hourlyStreamValues,
    "q116_stream_dedup" -> dedupStreamValues)

  /** DuckDB replays the EMA recursion stepwise along the contiguous
    * per-stock `day` axis (`day` is a row_number, so `rec.day + 1`
    * walks each series) with literals in the SAME association order
    * as [[StreamOps.emaStream]]'s `alpha * x + (1 - alpha) * state` —
    * identical double ops on exactly-representable inputs, so values
    * match bitwise before the 6-dp quantization. */
  val oracles: Map[String, String] = Map(
    // exactly-once restored: the deduped stream is the distinct
    // source set, so the rollup is a plain batch aggregation
    "q116_stream_dedup" ->
      """SELECT event_type, count(*) AS n_events,
        | count(DISTINCT user_id) AS n_users,
        | round(sum(value), 2) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // the closed-window rule: Spark's event-time watermark tracks max
    // event time floored to MILLISECONDS (EventTimeStatsAccum), so
    // the oracle floors the same way before subtracting the delay;
    // append mode emits a window once its end <= watermark
    "q114_stream_hourly" ->
      """WITH wm AS (
        | SELECT make_timestamp(epoch_ms(max(ts)) * 1000) - INTERVAL 2 HOUR AS w
        | FROM events),
        |agg AS (
        | SELECT date_trunc('hour', ts) AS h, event_type,
        |  count(*) AS n, round(sum(value), 2) AS sum_value
        | FROM events GROUP BY 1, 2)
        |SELECT strftime(h, '%Y-%m-%d %H:%M') AS hour, event_type, n, sum_value
        |FROM agg, wm WHERE h + INTERVAL 1 HOUR <= w
        |ORDER BY hour, event_type""".stripMargin,
    "q95_ema_stream_parity" ->
      s"""WITH RECURSIVE ${Quotes.sqlCteWhere("user_id <= 20")},
         |t AS (SELECT stock, day, close FROM quotes),
         |rec AS (
         |  SELECT stock, day, close AS ema FROM t WHERE day = 1
         |  UNION ALL
         |  SELECT t.stock, t.day, (2.0/13) * t.close + (1 - 2.0/13) * rec.ema
         |  FROM rec JOIN t ON t.stock = rec.stock AND t.day = rec.day + 1)
         |SELECT stock, day, floor(ema * 1e6 + 0.5) / 1e6 AS ema
         |FROM rec ORDER BY stock, day""".stripMargin)
}
