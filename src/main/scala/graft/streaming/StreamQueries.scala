package graft.streaming


import graft.sources.Quotes
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

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

  val entries: Map[String, Q] = Map("q95_ema_stream_parity" -> emaStreamValues)

  /** DuckDB replays the EMA recursion stepwise along the contiguous
    * per-stock `day` axis (`day` is a row_number, so `rec.day + 1`
    * walks each series) with literals in the SAME association order
    * as [[StreamOps.emaStream]]'s `alpha * x + (1 - alpha) * state` —
    * identical double ops on exactly-representable inputs, so values
    * match bitwise before the 6-dp quantization. */
  val oracles: Map[String, String] = Map(
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
