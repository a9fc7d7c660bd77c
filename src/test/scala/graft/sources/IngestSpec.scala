package graft.sources

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.charset.{Charset, StandardCharsets}
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Plane-C ingest coverage: encoding sniffing, bad-line skipping,
  * parallel zip fan-out, code normalization, qfq/hfq merging, the
  * sorted partitioned sink and the checkpoint cache. */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  private val workDir = "target/ingest-spec"

  private def writeZip(name: String, members: (String, Array[Byte])*): String = {
    Files.createDirectories(Paths.get(workDir))
    val path = s"$workDir/$name"
    val zos = new ZipOutputStream(new FileOutputStream(path))
    members.foreach { case (member, bytes) =>
      zos.putNextEntry(new ZipEntry(member))
      zos.write(bytes)
      zos.closeEntry()
    }
    zos.close()
    path
  }

  test("zip CSV source: GB18030 + UTF-8 sniffing, bad lines skipped") {
    val gb = Charset.forName("GB18030")
    val gbCsv = ("time,price,vol,dir\n09:30:00,10.5,100,买\nbadline\n" +
      "09:30:01,10.6,200,卖\n").getBytes(gb)
    val asciiCsv = "time,price,vol,dir\n09:30:02,11.0,300,B\n".getBytes(StandardCharsets.UTF_8)
    // 0x80 is no valid GB18030 lead byte -> forces the UTF-8 fallback
    val utfFallback = {
      val head = "time,price,vol,dir\n09:30:03,12.0,400,".getBytes(StandardCharsets.UTF_8)
      val out = new ByteArrayOutputStream()
      out.write(head); out.write(0x80); out.write('\n')
      out.toByteArray
    }
    writeZip("a.zip", "t1.csv" -> gbCsv, "skipme.txt" -> "x".getBytes)
    writeZip("b.zip", "t2.csv" -> asciiCsv, "t3.csv" -> utfFallback)

    val rows = Ingest.readZippedCsv(spark, s"$workDir/*.zip").collect()
    assert(rows.length == 4) // 2 gb + 1 ascii + 1 fallback; bad line dropped
    val gbRows = rows.filter(_.src_file == "t1.csv").sortBy(_.trade_time)
    assert(gbRows.map(_.direction).toSeq == Seq("买", "卖")) // decoded, not mojibake
    assert(gbRows.head.price == 10.5 && gbRows.head.volume == 100L)
    assert(rows.count(_.src_zip.endsWith("a.zip")) == 2) // per-zip fan-out keyed by path
    assert(rows.exists(r => r.src_file == "t3.csv" && r.volume == 400L))
  }

  test("normalizeCode: suffix completion, BJ/SH/SZ ranges, index namespace") {
    val df = Seq("600519", "000001", "000001.SZ", "430047", "830799", "688981 ")
      .toDF("code")
      .select(Ingest.normalizeCode(col("code")).as("norm"))
    assert(df.as[String].collect().toSeq ==
      Seq("600519.SH", "000001.SZ", "000001.SZ", "430047.BJ", "830799.BJ", "688981.SH"))
    val idx = Seq("000300", "399001").toDF("code")
      .select(Ingest.normalizeCode(col("code"), isIndex = true).as("n"))
    assert(idx.as[String].collect().toSeq == Seq("000300.SH", "399001.SZ"))
  }

  test("mergeAdjusted: suffixed left joins keep unmatched rows null") {
    val raw = Seq(("d1", 10.0), ("d2", 11.0)).toDF("trade_date", "close")
    val qfq = Seq(("d1", 9.5)).toDF("trade_date", "close")
    val hfq = Seq(("d1", 20.0), ("d2", 21.0)).toDF("trade_date", "close")
    val out = Ingest.mergeAdjusted(raw, qfq, hfq, Seq("trade_date"), Seq("close"))
      .orderBy("trade_date").collect()
    assert(out.map(_.schema.fieldNames.toSeq).head ==
      Seq("trade_date", "close", "close_qfq", "close_hfq"))
    assert(out(0).getDouble(2) == 9.5 && out(1).isNullAt(2)) // d2 has no qfq
    assert(out(1).getDouble(3) == 21.0)
  }

  test("sectorId: md5 16-hex prefix, deterministic") {
    val r = Seq(("region", "shanghai")).toDF("t", "n")
      .select(Ingest.sectorId(col("t"), col("n")).as("id"))
      .as[String].head()
    assert(r.length == 16 && r.matches("[0-9a-f]{16}"))
  }

  test("sorted partitioned sink: hive layout + per-file sort order") {
    val df = graft.Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val path = s"$workDir/sink"
    Ingest.writeSortedParquet(df, path, Seq("o_orderstatus"), Seq("o_totalprice"))
    val back = spark.read.parquet(path)
    assert(back.count() == df.count())
    assert(Files.list(Paths.get(path)).iterator().hasNext)
    // per-partition files are sorted by price: check one partition's
    // physical row order equals its sorted order
    val one = spark.read.parquet(s"$path/o_orderstatus=F")
      .select("o_totalprice").as[Double].collect()
    assert(one.sameElements(one.sorted))
  }

  test("hive sink: a partition-key filter scans ONLY that partition's files") {
    // the reference's core read optimization (quant_db_ddl.md:176-179,
    // SURVEY §4 row 1): the sink's hive layout must give readers
    // partition PRUNING — a key-filtered read lists one partition
    // directory, not a post-scan filter over all of them
    val df = graft.Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val path = s"$workDir/prune_sink"
    Ingest.writeSortedParquet(df, path, Seq("o_orderstatus"), Seq("o_totalprice"))
    def parquetFiles(p: String): Long = {
      val it = Files.walk(Paths.get(p)).iterator()
      var n = 0L
      while (it.hasNext) { if (it.next().toString.endsWith(".parquet")) n += 1 }
      n
    }
    val fFiles = parquetFiles(s"$path/o_orderstatus=F")
    val allFiles = parquetFiles(path)
    assert(fFiles > 0 && fFiles < allFiles, s"$fFiles of $allFiles")
    val read = spark.read.parquet(path).filter(col("o_orderstatus") === "F")
    read.collect()
    val scan = read.queryExecution.executedPlan.collectLeaves().head
    assert(scan.metrics.contains("numFiles"), scan.toString)
    assert(scan.metrics("numFiles").value == fFiles,
      s"scan read ${scan.metrics("numFiles").value} files, partition has $fFiles")
    // and the filter reached the scan as a PARTITION filter, not a
    // post-scan predicate
    assert(scan.toString.contains("PartitionFilters"), scan.toString)
  }

  test("bucketed co-located join: zero exchanges below the merge join") {
    // q124's storage contract: both sides pre-shuffled into the same
    // 8 (stock, day) buckets, so the merge join reads bucket i of
    // both tables in one task — no Exchange under the SMJ; the only
    // shuffle is the post-join per-stock rollup
    val df = graft.analytics.IngestQueries.bucketedJoin(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("SortMergeJoin"), plan)
    val joinPart = plan.split("SortMergeJoin").last // everything BELOW the join
    assert(!joinPart.contains("Exchange hashpartitioning"),
      "exchange under the bucketed join:\n" + joinPart)
    val ex = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange"))
    assert(ex <= 1, plan) // the per-stock rollup only
    assert(plan.contains("Bucketed: true"), plan)
  }

  test("compactPartitioned: many files per partition become exactly one, lossless") {
    import java.nio.file.{Files, Paths}
    def files(p: String): Seq[String] = {
      val it = Files.walk(Paths.get(p)).iterator()
      val b = Seq.newBuilder[String]
      while (it.hasNext) { val f = it.next().toString; if (f.endsWith(".parquet")) b += f }
      b.result()
    }
    val raw = s"$workDir/compact_raw"; val dst = s"$workDir/compact_out"
    val df = (1 to 400).map(i => (i.toLong, (i % 5).toLong, i * 1.5)).toDF("id", "p", "v")
    df.repartition(8).write.partitionBy("p").mode("overwrite").parquet(raw)
    // the simulated append-heavy state: several files in each partition
    assert(files(s"$raw/p=0").size > 1, files(raw).mkString("\n"))
    Ingest.compactPartitioned(spark, raw, dst, "p")
    (0L until 5L).foreach { p =>
      assert(files(s"$dst/p=$p").size == 1, s"p=$p: " + files(s"$dst/p=$p"))
    }
    // lossless: same multiset of rows
    val a = spark.read.parquet(raw).select("id", "p", "v").orderBy("id").collect()
    val b = spark.read.parquet(dst).select("id", "p", "v").orderBy("id").collect()
    assert(a.length == 400 && a.toSeq == b.toSeq)
  }

  test("checkpointParquet: roundtrip with truncated lineage") {
    val df = Seq((1, "a"), (2, "b")).toDF("id", "v")
    val back = Ingest.checkpointParquet(df, s"$workDir/ckpt")
    assert(back.orderBy("id").collect().map(_.getString(1)).toSeq == Seq("a", "b"))
    // re-read from disk, not a recompute of the original plan
    assert(back.queryExecution.analyzed.toString.toLowerCase.contains("parquet"))
  }
}
