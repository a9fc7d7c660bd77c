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

  test("windowedDistinctSketch: KMV buffers merge across micro-batches") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val df = in.toDF().toDF("ts", "user_id")
    val q = StreamOps.windowedDistinctSketch(df, k = 4)
      .writeStream.format("memory").queryName("kmv_stream_out")
      .outputMode("append").start()
    try {
      in.addData(
        (Timestamp.valueOf("2024-01-01 10:05:00"), 9L),
        (Timestamp.valueOf("2024-01-01 10:10:00"), 3L),
        (Timestamp.valueOf("2024-01-01 10:15:00"), 9L)) // dup within batch
      q.processAllAvailable()
      in.addData((Timestamp.valueOf("2024-01-01 10:20:00"), 7L)) // later batch
      q.processAllAvailable()
      // advance the watermark past 10:00+1h+2h to close the window
      in.addData((Timestamp.valueOf("2024-01-01 14:00:00"), 1L))
      q.processAllAvailable()
      val out = spark.table("kmv_stream_out")
        .select(date_format(col("hour"), "HH").as("h"), col("mins"),
          col("n_events"))
        .collect().map(r => r.getString(0) ->
          (r.getSeq[Long](1), r.getLong(2))).toMap
      // state carried the partial sketch across batches and deduped:
      // the closed window's sketch is the distinct user hashes of
      // BOTH batches, sorted (k=4 > 3 distinct → exhaustive)
      val expected = Seq(9L, 3L, 7L)
        .map(u => graft.functions.DedupFns.portableHash60(lit(u.toString)))
      val expectedVals = spark.range(1)
        .select(array(expected: _*).as("a"))
        .head().getSeq[Long](0).sorted
      assert(out("10") == (expectedVals, 4L))
    } finally q.stop()
  }

  test("q143 parity: streamed sketch == batch KMV on closed windows") {
    val sf = "/root/testdata/sf0.001"
    val streamed = StreamQueries.streamedDistinct(spark, sf)
      .select(date_format(col("hour"), "yyyy-MM-dd HH:mm").as("h"),
        col("mins"), col("n_events"))
      .collect().map(r => (r.getString(0), r.getSeq[Long](1), r.getLong(2)))
      .toSet
    val ev = graft.Tables.load(spark, sf, "events")
    val tsUs = unix_micros(col("ts").cast("timestamp"))
    val wmUs = (ev.agg(max(tsUs)).head().getLong(0) / 1000) * 1000 -
      2L * 3600 * 1000 * 1000
    val batch = ev
      .withColumn("hh",
        graft.functions.DedupFns.portableHash60(col("user_id").cast("string")))
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(graft.functions.SketchFns.kmvMinK(col("hh"), 8).as("mins"),
        count(lit(1)).as("n_events"))
      .filter(unix_micros(col("hour").cast("timestamp")) +
        3600L * 1000 * 1000 <= wmUs)
      .select(date_format(col("hour"), "yyyy-MM-dd HH:mm").as("h"),
        col("mins"), col("n_events"))
      .collect().map(r => (r.getString(0), r.getSeq[Long](1), r.getLong(2)))
      .toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("q114 parity: streamed hourly == batch agg on closed windows") {
    val sf = "/root/testdata/sf0.001"
    // compare on formatted strings: the events.ts parquet column has
    // shipped as both TIMESTAMP and TIMESTAMP_NTZ across testdata
    // regenerations, and a typed getTimestamp crashes on the NTZ
    // flavor (LocalDateTime rows)
    val hourFmt = (c: org.apache.spark.sql.Column) =>
      date_format(c, "yyyy-MM-dd HH:mm").as("h")
    val streamed = StreamQueries.streamedHourly(spark, sf)
      .select(hourFmt(col("hour")), col("event_type"), col("n"), col("sum_value"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val ev = graft.Tables.load(spark, sf, "events")
    val tsUs = unix_micros(col("ts").cast("timestamp"))
    // Spark's watermark tracks max event time floored to MILLISECONDS
    val wmUs = (ev.agg(max(tsUs)).head().getLong(0) / 1000) * 1000 -
      2L * 3600 * 1000 * 1000
    val batch = ev
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .filter(unix_micros(col("hour").cast("timestamp")) +
        3600L * 1000 * 1000 <= wmUs)
      .select(hourFmt(col("hour")), col("event_type"), col("n"), col("sum_value"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("q119 parity: streamed sessions == batch gaps-and-islands on closed sessions") {
    val sf = "/root/testdata/sf0.001"
    val streamed = StreamQueries.streamedSessions(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    val ev = graft.Tables.load(spark, sf, "events")
      .select(col("ts").cast("timestamp").as("ts"), col("user_id"), col("value"))
    val tsUs = unix_micros(col("ts"))
    val gapUs = 8L * 3600 * 1000 * 1000
    val wmUs = (ev.agg(max(tsUs)).head().getLong(0) / 1000) * 1000 -
      2L * 3600 * 1000 * 1000
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts")
    val batch = ev
      .withColumn("brk", when(lag(col("ts"), 1).over(w).isNull ||
        tsUs - unix_micros(lag(col("ts"), 1).over(w)) >= gapUs, 1).otherwise(0))
      .withColumn("sid", sum("brk").over(w.rowsBetween(Long.MinValue, 0)))
      .groupBy("user_id", "sid")
      .agg(min(tsUs).as("session_start_us"),
        (max(tsUs) + gapUs).as("session_end_us"),
        count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .filter(col("session_end_us") <= wmUs)
      .select("user_id", "session_start_us", "session_end_us", "n_events", "sum_value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(streamed == batch && streamed.nonEmpty)
    // multi-event sessions exist, including ones merged ACROSS the
    // replay's batch boundaries — otherwise the merge path is untested
    assert(streamed.exists(_._4 > 1))
  }

  test("q120 parity: streamed interval join == batch join, incl. cross-batch matches") {
    val sf = "/root/testdata/sf0.001"
    val streamed = StreamQueries.streamedAttribution(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val ev = graft.Tables.load(spark, sf, "events")
      .select(col("ts").cast("timestamp").as("ts"), col("event_id"),
        col("user_id"), col("event_type"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("vu"), col("event_id").as("ve"),
        unix_micros(col("ts")).as("vt"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("pe"),
        unix_micros(col("ts")).as("pt"))
    val batch = v.join(p, col("vu") === col("pu") && col("pt") >= col("vt") &&
        col("pt") <= col("vt") + 24L * 3600 * 1000 * 1000)
      .select(col("vu"), col("ve"), col("pe"), (col("pt") - col("vt")).as("lag"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
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

  test("q149 parity: streamed OHLC == batch bars on the kept set; late slices behave") {
    val sf = "/root/testdata/sf0.001"
    val streamed = StreamQueries.streamedOhlc(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))).toSet
    val ev = graft.Tables.load(spark, sf, "events")
      .select(col("ts").cast("timestamp").as("ts"), col("event_id"), col("value"))
    val tsUs = unix_micros(col("ts"))
    val mm = ev.agg(min(tsUs), max(tsUs)).head()
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val sliceUs = 6L * 3600 * 1000 * 1000
    val lateHead = tsUs < lit(lo + sliceUs) && col("event_id") % 5 === 0
    val wmUs = (hi / 1000) * 1000 - 24L * 3600 * 1000 * 1000
    def bars(src: org.apache.spark.sql.DataFrame) = {
      val ord = struct(col("ts"), col("event_id"))
      src.groupBy(date_trunc("minute", col("ts")).as("bar"))
        .agg(count(lit(1)).as("n_ticks"),
          min_by(col("value"), ord).as("open"), max("value").as("high"),
          min("value").as("low"), max_by(col("value"), ord).as("close"),
          round(sum("value"), 2).as("turnover"))
        .filter(unix_micros(col("bar")) + 60L * 1000 * 1000 <= wmUs)
        .select(unix_micros(col("bar")).as("bar_start_us"), col("n_ticks"),
          col("open"), col("high"), col("low"), col("close"), col("turnover"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))).toSet
    }
    // the stream must equal the batch resample of events MINUS the
    // beyond-horizon late slice (those ticks were dropped) ...
    assert(streamed == bars(ev.filter(!lateHead)) && streamed.nonEmpty)
    // ... and differ from the all-rows resample: the drop is REAL
    // (the fixture has late-head ticks, and at least one bar lost one)
    assert(ev.filter(lateHead).count() > 0)
    assert(streamed != bars(ev))
    // the in-horizon late slice (batch 1's tail, delivered in batch 2)
    // is nonempty and ABSORBED: its bars are closed and their streamed
    // tick counts include the late-delivered rows (they match the
    // kept-set batch counts, which count those rows)
    val b1 = lo + (hi - lo) / 3
    val lateTail = ev.filter(tsUs >= lit(b1 - sliceUs) && tsUs < lit(b1) &&
      col("event_id") % 5 === 0)
    assert(lateTail.count() > 0)
    val tailBars = lateTail
      .select(unix_micros(date_trunc("minute", col("ts"))).as("b"))
      .collect().map(_.getLong(0)).toSet
    assert(tailBars.subsetOf(streamed.map(_._1)))
  }

  test("dropDuplicatesWithinWatermark: state evicted past the horizon") {
    // Pins the q116 eviction semantics: a duplicate arriving WITHIN
    // the watermark delay of its first delivery is absorbed, but once
    // the watermark passes eventTime + delay the key's state is
    // EVICTED and a later redelivery (with a fresh, non-late event
    // time) is re-emitted. This is exactly why state stays bounded by
    // the horizon — plain dropDuplicates("event_id") would dedup the
    // late redelivery too, by keeping every key forever.
    implicit val sc = spark.sqlContext
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00").getTime
    def t(mins: Long) = new Timestamp(t0 + mins * 60000)
    val in = MemoryStream[(Timestamp, Long)]
    val df = in.toDF().toDF("ts", "event_id")
    val q = df.withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("memory").queryName("dedup_evict_out")
      .outputMode("append").start()
    try {
      in.addData((t(0), 1L)) // first delivery of id 1; wm after: t0-1h
      q.processAllAvailable()
      // redelivery 5min later: inside the horizon -> absorbed; the
      // 10h event advances the watermark to t0+9h, evicting id 1
      // (expiry t0+1h) at the next batch boundary
      in.addData((t(5), 1L), (t(600), 2L))
      q.processAllAvailable()
      // redelivery at t0+9h30: not late (>= wm t0+9h), state for id 1
      // is gone -> emitted AGAIN
      in.addData((t(570), 1L))
      q.processAllAvailable()
      val ids = spark.table("dedup_evict_out")
        .collect().map(_.getLong(1)).toSeq.sorted
      assert(ids == Seq(1L, 1L, 2L))
    } finally q.stop()
  }

  // production guidance for the streaming tier is the RocksDB state
  // provider (state no longer bounded by executor heap at real key
  // cardinalities); the two tests below run the tier's two stateful
  // families under it and pin value parity with the default
  // HDFS-backed provider so the recommendation is tested, not
  // asserted. Each run uses a fresh scratch source/checkpoint, so
  // the paired queries are independent.
  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toVector).toVector.sortBy(_.mkString("|"))
  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("q119 sessions: RocksDB state-store provider is value-identical") {
    val sf = "/root/testdata/sf0.001"
    val default = sortedRows(StreamQueries.sessionStreamValues(spark, sf))
    val rocks = withRocksDb(sortedRows(StreamQueries.sessionStreamValues(spark, sf)))
    assert(rocks.nonEmpty && rocks == default,
      s"rocksdb=${rocks.take(3)} default=${default.take(3)}")
  }

  test("q154 stream-static join: index catches history, not in-stream arrivals") {
    val sf = "/root/testdata/sf0.001"
    val rows = StreamQueries.streamedIndexDedup(spark, sf)
      .select(col("arrival_id"), col("batch_id"),
        col("keep_id").isNotNull.as("hit"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // all three micro-batches flowed through the stateless join
    assert(rows.map(_._2).distinct.sorted.toSeq == Seq(0L, 1L, 2L))
    // batch-1 re-crawls of HISTORY are caught by the static index ...
    val histRecrawl = rows.filter(r => r._1 >= 100000 && r._1 < 200000)
    assert(histRecrawl.nonEmpty && histRecrawl.forall(_._3))
    // ... but batch-3 re-crawls of BATCH-1 ARRIVALS are NOT — the
    // static side never saw them (the gap q134's write-back closes)
    val arrivalRecrawl = rows.filter(_._1 >= 300000)
    assert(arrivalRecrawl.nonEmpty && arrivalRecrawl.forall(!_._3))
  }

  test("q156 foreachBatch write-back closes q154's gap on the same replay") {
    val sf = "/root/testdata/sf0.001"
    // ONE stream run feeds both the raw assertions and the rollup
    val verdicts = StreamQueries.streamedWriteBack(spark, sf)
    // raw verdicts: every batch-3 re-crawl of a batch-1 arrival
    // (ids +300000, re-crawling docs 400–409) is caught as a STREAM
    // dup, and its keep_id is the original batch-1 arrival
    val raw = verdicts
      .collect().map(r => (r.getLong(1), // arrival_id
        if (r.isNullAt(5)) None else Some(r.getLong(5)))) // keep_id
    val recrawls = raw.filter(_._1 >= 300000)
    assert(recrawls.nonEmpty)
    assert(recrawls.forall(_._2.exists(k => k >= 400 && k < 410)),
      recrawls.mkString(", "))
    // and the aggregate proof against q154 (identical batch geometry,
    // static index): the write-back converts EXACTLY q154's
    // batch-3 false-news into stream-dups
    def byBatch(df: org.apache.spark.sql.DataFrame, newCol: String) = df
      .groupBy("batch_id")
      .agg(sum(newCol).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wb = StreamQueries.writeBackRollup(verdicts)
    val staticJoin = StreamQueries.indexDedupStreamValues(spark, sf)
    val wbNew = byBatch(wb, "n_new")
    val sjNew = byBatch(staticJoin, "n_new")
    val wbStream = byBatch(wb, "n_dup_stream")
    assert(wbStream(2L) > 0)
    for (b <- Seq(0L, 1L, 2L))
      assert(sjNew(b) - wbNew(b) == wbStream(b),
        s"batch $b: static-new=${sjNew(b)} wb-new=${wbNew(b)} stream-dup=${wbStream(b)}")
  }

  test("q156 restart recovery: killed-and-resumed run == uninterrupted run") {
    val sf = "/root/testdata/sf0.001"
    // interrupted + resumed, ONE checkpoint dir: run 1 crashes AFTER
    // batch 1's verdict write and index append land but BEFORE its
    // checkpoint commit — the widest at-least-once retry window
    val rootA = graft.TempDirs.scratch("graft_wb_recover", preferShm = true)
    val (idxA, startA) = StreamQueries.writeBackHarness(spark, sf, rootA)
    startA(Some(1L))
    assert(new java.io.File(s"$rootA/ckpt/commits/0").exists,
      "batch 0 must have committed before the injected crash")
    assert(!new java.io.File(s"$rootA/ckpt/commits/1").exists,
      "batch 1 must NOT have committed — the crash preempted it")
    // run 2 on the same checkpoint: re-executes batch 1, then batch 2
    startA(None)
    assert(new java.io.File(s"$rootA/ckpt/commits/2").exists)
    val recovered = spark.read.parquet(s"$rootA/out").drop("bid")
    // the retry really re-ran batch 1 against an index already holding
    // its own fps: its fresh arrivals carry the self-hit signature
    assert(recovered.filter(col("batch_id") === 1L
      && col("keep_id") === col("arrival_id")).count() > 0,
      "no self-hit verdicts — the retry window was not exercised")
    // uninterrupted control run, fresh root
    val rootB = graft.TempDirs.scratch("graft_wb_control", preferShm = true)
    val (idxB, startB) = StreamQueries.writeBackHarness(spark, sf, rootB)
    startB(None)
    val control = spark.read.parquet(s"$rootB/out").drop("bid")
    // ROLLUP IDENTITY: the self-hit classification absorbs the retry,
    // so the resumed run's counters equal the uninterrupted run's
    val a = StreamQueries.writeBackRollup(recovered)
      .collect().map(_.toSeq.toVector).toVector
    val b = StreamQueries.writeBackRollup(control)
      .collect().map(_.toSeq.toVector).toVector
    assert(a == b && a.nonEmpty, s"recovered=$a\ncontrol=$b")
    // FINAL INDEX IDENTITY: the crashed attempt's append was not
    // duplicated by the retry (empty write-back set on re-probe)
    val ia = spark.table(idxA)
    val ib = spark.table(idxB)
    assert(ia.count() == ib.count())
    assert(ia.exceptAll(ib).isEmpty && ib.exceptAll(ia).isEmpty)
  }

  test("q153 streaming CMS: bounded cells, one-sided error, batch parity") {
    val sf = "/root/testdata/sf0.001"
    val cells = StreamQueries.streamedCms(spark, sf)
      .collect().map(r => (r.getTimestamp(0).getTime, r.getInt(1),
        r.getLong(2), r.getLong(3)))
    assert(cells.nonEmpty)
    // the CMS state contract: ≤ d·w = 128 cells per window, ever
    val perHour = cells.groupBy(_._1).view.mapValues(_.length)
    assert(perHour.values.max <= 128)
    // keys unique (the sketch is a grid, not a bag)
    assert(cells.map(c => (c._1, c._2, c._3)).distinct.length == cells.length)
    // streamed cells == the batch sketch on closed hours, cell for
    // cell (the cross-micro-batch merge is the aggregation itself)
    import graft.analytics.CorpusQueries.{cmsBucket, cmsDepth, cmsRowHash}
    val ev = graft.Tables.load(spark, sf, "events")
      .filter(col("user_id").isNotNull)
      .select(col("ts").cast("timestamp").as("ts"), col("user_id"))
    val wmUs = (ev.agg(max(unix_micros(col("ts")))).head().getLong(0) / 1000) *
      1000 - 2L * 3600 * 1000 * 1000
    val h = cmsRowHash(col("user_id").cast("string"))
    val batch = ev.select(col("ts"), h.as("h"))
      .select(col("ts"), explode(array((0 until cmsDepth).map(r =>
        struct(lit(r).as("r"), cmsBucket(col("h"), r).as("bucket"))): _*)).as("c"))
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("c.r").as("r"),
        col("c.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .filter(unix_micros(col("hour")) + 3600L * 1000 * 1000 <= wmUs)
      .collect().map(r => (r.getTimestamp(0).getTime, r.getInt(1),
        r.getLong(2), r.getLong(3)))
    assert(cells.toSet == batch.toSet)
    // the estimate never undercounts (CMS's one-sided guarantee)
    val rows = StreamQueries.cmsStreamValues(spark, sf).collect()
    assert(rows.nonEmpty && rows.forall(r => r.getLong(3) >= r.getLong(2)))
  }

  test("q149 OHLC bars: RocksDB state-store provider is value-identical") {
    // the third stateful family (watermarked windowed agg with late
    // data absorbed AND dropped) under the production state provider:
    // the late-arrival semantics must not depend on the store
    val sf = "/root/testdata/sf0.001"
    val default = sortedRows(StreamQueries.ohlcStreamValues(spark, sf))
    val rocks = withRocksDb(sortedRows(StreamQueries.ohlcStreamValues(spark, sf)))
    assert(rocks.nonEmpty && rocks == default,
      s"rocksdb=${rocks.take(3)} default=${default.take(3)}")
  }

  test("q120 attribution: RocksDB state-store provider is value-identical") {
    // the stream-stream interval join holds TWO watermark-bounded
    // buffers (views + purchases) in state — the tier's heavier
    // state shape; same provider-portability pin as q119 so the
    // 100 TB state-store answer covers both stateful families
    // (session window AND stream-stream join)
    val sf = "/root/testdata/sf0.001"
    val default = sortedRows(StreamQueries.streamedAttribution(spark, sf))
    val rocks = withRocksDb(sortedRows(StreamQueries.streamedAttribution(spark, sf)))
    assert(rocks.nonEmpty && rocks == default,
      s"rocksdb=${rocks.take(3)} default=${default.take(3)}")
  }
}
