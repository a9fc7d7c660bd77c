package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (builder brief §streams; SURVEY.md
  * §2.10): the reference's daily-batch pipelines re-expressed as
  * streaming transforms so the same factor logic runs on live feeds.
  *
  * Scale: both operators are keyed state — the windowed aggregation
  * shuffles on (window, type) with watermark-bounded state, the EMA
  * keeps O(1) state per entity in the state store. Identical plan on
  * a 1000-executor cluster.
  */
object StreamOps {

  /** Tumbling event-time aggregation with a 2h watermark — the
    * streaming form of the q25 batch window (readStream → transform →
    * writeStream ready). */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(col("win.start").as("hour"), col("event_type"), col("n"),
        col("sum_value"))

  /** Windowed distinct-cardinality SKETCH: per tumbling hour, the
    * KMV bottom-k sketch ([[graft.functions.SketchFns.kmvMinK]]) of
    * the portable user-id hash, plus the event count. Streaming
    * refuses `count(distinct)` outright — the exact per-window
    * distinct set is unbounded state — but the sketch is a legal
    * streaming aggregate: its buffer is ≤ k longs per OPEN window
    * (TypedImperativeAggregate partials serialize into the state
    * store like any other buffer) and merges across micro-batches by
    * union-and-trim, so watermark eviction bounds total state at
    * k·open_windows longs. The estimate itself is presentation —
    * derived from the emitted sketch after window close, exactly as
    * in the batch entry (q140). A null user id hashes to null, which
    * the aggregate SKIPS while n_events still counts the row — the
    * oracle mirrors with an IS NOT NULL guard on its sketch CTE. */
  def windowedDistinctSketch(events: DataFrame, k: Int): DataFrame =
    events
      .withColumn("h",
        graft.functions.DedupFns.portableHash60(col("user_id").cast("string")))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("win"))
      .agg(graft.functions.SketchFns.kmvMinK(col("h"), k).as("mins"),
        count(lit(1)).as("n_events"))
      .select(col("win.start").as("hour"), col("mins"), col("n_events"))

  /** Stateful streaming EMA — the pandas ewm(adjust=False) recursion
    * of [[graft.ops.TsOps.ema]] carried across micro-batches with one
    * Double of state per key (flatMapGroupsWithState, append mode).
    * Rows are (key, seq, value); within a micro-batch each key's rows
    * are applied in `seq` order (pinned convention — event time must
    * be monotone per key across batches for exact replay parity). */
  def emaStream(ds: Dataset[(Long, Long, Double)],
                alpha: Double): Dataset[(Long, Long, Double)] = {
    implicit val stateEnc: Encoder[Double] = Encoders.scalaDouble
    implicit val outEnc: Encoder[(Long, Long, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaDouble)
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[(Long, Long, Double)], state: GroupState[Double]) =>
          var st = state.getOption.getOrElse(Double.NaN)
          val out = rows.toSeq.sortBy(_._2).map { case (k, seq, x) =>
            st = if (st.isNaN) x else alpha * x + (1 - alpha) * st
            (k, seq, st)
          }
          state.update(st)
          out.iterator
      }
  }
}
