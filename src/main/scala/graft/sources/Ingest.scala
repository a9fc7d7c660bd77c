package graft.sources

import java.io.ByteArrayInputStream
import java.nio.ByteBuffer
import java.nio.charset.{CharacterCodingException, Charset, CodingErrorAction, StandardCharsets}
import java.util.zip.ZipInputStream

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** One tick row parsed out of a zipped CSV member (the reference's
  * 4-column usecols projection, `Project report.md:453-470`). */
case class TickRow(src_zip: String, src_file: String, trade_time: String,
                   price: Double, volume: Long, direction: String)

/** Plane-C ingest: the reference's ETL surface re-expressed on Spark
  * (`Project report.md §4.1-4.2`) — encoding-sniffing zip/CSV
  * reading, id normalization, adjusted-price merging, sector
  * hashing, and the partitioned+sorted parquet sink.
  *
  * Scale notes: `binaryFile` gives one task per zip (the reference
  * hand-rolls a 28-process pool for the same parallelism;
  * `Project report.md:474-479`), so a directory of thousands of
  * daily zips fans out across the cluster with no driver loop. Each
  * zip is bounded (a day × exchange bundle), so whole-file bytes per
  * task is the same memory contract as the reference's in-memory
  * unzip.
  */
object Ingest {

  /** Smart decode (`read_csv_smart`, Project report.md:453-470):
    * strict GB18030 first (legacy files), UTF-8 with replacement as
    * the fallback — the reference's exact strategy order. */
  private[sources] def decodeSmart(bytes: Array[Byte]): String = {
    val gb = Charset.forName("GB18030").newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try gb.decode(ByteBuffer.wrap(bytes)).toString
    catch {
      case _: CharacterCodingException =>
        val utf = StandardCharsets.UTF_8.newDecoder()
          .onMalformedInput(CodingErrorAction.REPLACE)
          .onUnmappableCharacter(CodingErrorAction.REPLACE)
        utf.decode(ByteBuffer.wrap(bytes)).toString
    }
  }

  /** `on_bad_lines='skip'`: wrong arity or unparseable numerics drop
    * the line, never the batch. */
  private[sources] def parseLine(zip: String, member: String,
                                 line: String): Option[TickRow] = {
    val parts = line.split(",", -1)
    if (parts.length < 4) None
    else try {
      Some(TickRow(zip, member, parts(0).trim,
        parts(1).trim.toDouble, parts(2).trim.toLong, parts(3).trim))
    } catch { case _: NumberFormatException => None }
  }

  /** S2/S3: parallel encoding-sniffing CSV-in-zip source. One Spark
    * task per zip file; members are decoded, header-skipped, parsed
    * and bad-line-filtered in a single in-memory pass. */
  def readZippedCsv(spark: SparkSession, pathGlob: String): Dataset[TickRow] = {
    implicit val enc = Encoders.product[TickRow]
    // expand the glob driver-side and parallelize the explicit file
    // list, ONE TASK PER ZIP regardless of zip size: both the
    // DataFrame binaryFile source and sc.binaryFiles pack small
    // files together (maxPartitionBytes / openCostInBytes sizing),
    // which serializes a whole directory of small exchange bundles
    // onto a few cores — the exact fan-out the reference hand-rolls
    // with its 28-process pool (Project report.md:474-479)
    val hadoopConf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(pathGlob)
    val fs = p.getFileSystem(hadoopConf)
    // globStatus returns null (not empty) for a nonexistent base path
    val files = Option(fs.globStatus(p)).getOrElse(Array.empty)
      .map(_.getPath.toString).sorted.toSeq
    // ship the SESSION's Hadoop conf to executors — a fresh
    // `new Configuration()` would drop spark.hadoop.* credentials /
    // endpoints and break on object stores (works only on local FS)
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(hadoopConf))
    val rdd = spark.sparkContext
      .parallelize(files, files.length.max(1))
      .flatMap { path =>
        val hp = new org.apache.hadoop.fs.Path(path)
        val zis = new ZipInputStream(
          hp.getFileSystem(confBc.value.value).open(hp))
        // single buffer materialized before the stream closes (one
        // allocation, not a list per member + a list per zip)
        val rows = scala.collection.mutable.ArrayBuffer.empty[TickRow]
        Iterator.continually(zis.getNextEntry)
          .takeWhile(_ != null)
          .filter(e => !e.isDirectory && e.getName.toLowerCase.endsWith(".csv"))
          .foreach { e =>
            val text = decodeSmart(zis.readAllBytes())
            text.linesIterator.drop(1) // header
              .foreach(l => parseLine(path, e.getName, l).foreach(rows += _))
          }
        zis.close()
        rows
      }
    spark.createDataset(rdd)
  }

  /** X6 `normalize_code` (Project report.md:547-560, 612-618): force
    * '6-digit.suffix'; keep existing suffixes; indexes use the
    * 000->SH namespace, stocks map 60/68->SH, 4/8->BJ, else SZ. */
  def normalizeCode(code: Column, isIndex: Boolean = false): Column = {
    val c = trim(code)
    val suffix =
      if (isIndex) when(c.startsWith("000"), ".SH").otherwise(".SZ")
      else when(c.rlike("^(60|68)"), ".SH")
        .when(c.rlike("^[48]"), ".BJ")
        .otherwise(".SZ")
    when(c.rlike("\\.(SZ|SH|BJ)$"), c).otherwise(concat(c, suffix))
  }

  /** J10 qfq/hfq ingest merge (`process_market_data`, Project
    * report.md:575-595): suffix-renamed LEFT joins folding the
    * unadjusted/forward/backward price files into one wide row. */
  def mergeAdjusted(raw: DataFrame, qfq: DataFrame, hfq: DataFrame,
                    keys: Seq[String], priceCols: Seq[String]): DataFrame = {
    def suffixed(df: DataFrame, sfx: String): DataFrame =
      df.select((keys.map(col) ++
        priceCols.map(c => col(c).as(s"$c$sfx"))): _*)
    raw.join(suffixed(qfq, "_qfq"), keys, "left")
      .join(suffixed(hfq, "_hfq"), keys, "left")
  }

  /** Sector identity hash (`parse_sector_file`, Project
    * report.md:601-617): md5(type_name) truncated to 16 hex chars. */
  def sectorId(sectorType: Column, sectorName: Column): Column =
    substring(md5(concat_ws("_", sectorType, sectorName)), 1, 16)

  /** S4: partitioned, sorted parquet sink (`Project
    * report.md:644-656`): co-locate each partition's rows in one
    * shuffle partition, sort within, emit hive-partitioned files —
    * readers get partition pruning + per-file sort order. */
  def writeSortedParquet(df: DataFrame, path: String,
                         partCols: Seq[String], sortCols: Seq[String]): Unit = {
    // hash-partition into 4x the shuffle parallelism: with a low-
    // cardinality partition key, 1x hashing leaves collision gaps
    // that idle writers, and over-partitioning closes them at the
    // cost of empty (free) partitions. NOT repartitionByRange — the
    // range sampler runs a separate job over the child, re-executing
    // an expensive parse lineage end to end.
    val n = df.sparkSession.sessionState.conf.numShufflePartitions * 4
    df.repartition(n, partCols.map(col): _*)
      .sortWithinPartitions((partCols ++ sortCols).map(col): _*)
      .write.partitionBy(partCols: _*).mode("overwrite").parquet(path)
  }

  /** S9: partition compaction — rewrite a hive-partitioned store so
    * each partition's rows land in ONE task (and therefore one
    * right-sized file): `repartition(partCol)` makes every task the
    * owner of the partitions hashed to it, and `partitionBy` then
    * emits exactly one file per (task, partition-value) pair. The
    * maintenance pass every append-heavy store needs — small files
    * from streaming/micro-batch writers cost a footer read + open per
    * file per scan. Cost: one shuffle of the store, amortized over
    * every later read. For very large partitions add a bounded
    * `maxRecordsPerFile` option at the call site instead of changing
    * the layout contract here. */
  def compactPartitioned(spark: org.apache.spark.sql.SparkSession,
                         src: String, dst: String, partCol: String): Unit =
    spark.read.parquet(src)
      .repartition(col(partCol))
      .write.partitionBy(partCol).mode("overwrite").parquet(dst)

  /** S5: parquet checkpoint between pipeline stages — truncates the
    * lineage so an expensive cleaned table is computed once and
    * re-read by every downstream consumer. */
  def checkpointParquet(df: DataFrame, path: String): DataFrame = {
    df.write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }
}
