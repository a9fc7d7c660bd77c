package graft.streaming


import graft.sources.Quotes
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

/** q95: streaming/batch parity for the stateful EMA (SURVEY.md
  * §2.10) as a driver-visible entry. A (stock, day, close) slice of
  * the panel is written as three day-ranged parquet files; a file
  * stream replays them as three micro-batches (maxFilesPerTrigger=1,
  * oldest-first by modification time — the writes are sequential
  * jobs, so mod times strictly increase); [[StreamOps.emaStream]]
  * carries one Double of state per stock across the batches; the
  * result is joined back against the one-pass batch recursion
  * ([[graft.ops.TsOps.ema]]). Same arithmetic in the same order on
  * both paths -> the join must match BIT-EXACTLY, and the returned
  * summary row pins rows / matches / max divergence. Rows-only by
  * design (the stream's input lives in a temp dir, not the oracle's
  * parquet set), but every value is deterministic.
  *
  * Scale: the streaming side is the real plan — file source →
  * stateful flatMapGroupsWithState keyed on the entity id; the only
  * scale-variant piece is the state store, O(1) per key.
  */
object StreamQueries {
  private type Q = (SparkSession, String) => DataFrame

  def emaStreamParity: Q = (s, dir) => {
    val alpha = 2.0 / (12 + 1)
    val root = graft.TempDirs.scratch("graft_stream")
    val slice = Quotes.panel(s, dir)
      .filter(col("stock") <= 20)
      .select(col("stock").cast("long").as("stock"), col("day"), col("close"))
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
    val q = StreamOps.emaStream(streamIn, alpha)
      .toDF("stock", "day", "ema_stream")
      .writeStream.format("memory").queryName("q95_ema_out")
      .option("checkpointLocation", s"$root/ckpt")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = s.table("q95_ema_out")
    val batch = graft.ops.TsOps.ema(
      slice, "stock", Seq("day"), "close", alpha, "ema_batch")
      .select("stock", "day", "ema_batch")
    streamed.join(batch, Seq("stock", "day"), "full_outer")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("ema_stream") === col("ema_batch"), 1L).otherwise(0L))
          .as("n_bitexact"),
        max(abs(col("ema_stream") - col("ema_batch"))).as("max_abs_diff"),
        sum(when(col("ema_stream").isNull || col("ema_batch").isNull, 1L)
          .otherwise(0L)).as("n_unmatched"))
  }

  val entries: Map[String, Q] = Map("q95_ema_stream_parity" -> emaStreamParity)

  /** Rows-only: the stream input is a temp-dir fixture the driver's
    * DuckDB side can't see; the output values are deterministic. */
  val oracles: Map[String, String] = Map.empty
}
