package graft.sources

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (builder brief): image/audio/video
  * payloads ride as opaque `binary` columns with a typed metadata
  * struct; decode / feature-extract / frame-sample run as batched
  * per-partition passes over the bytes.
  *
  * The DECODE STEP IS A STUB: this container has no image/audio
  * codecs, so [[fakeDecode]] produces deterministic hash-seeded
  * pseudo-features. Everything around it — the binary schema, the
  * metadata struct, the batch shape (fixed-size batches decoded
  * together, the Arrow-UDF execution contract), the byte-slicing
  * frame sampler, and the partitioning — is real and tested
  * (MultimodalSpec). Swapping in a real codec changes one function.
  */
object Multimodal {

  /** Media table synthesized from `documents`: payload = UTF-8 bytes
    * of the text, modality assigned round-robin, typed metadata. */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.load(spark, sfDir, "documents")
    val payload = col("text").cast("binary")
    d.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3).cast("int") + 1).as("modality"),
      payload.as("payload"))
      .withColumn("meta", struct(
        length(col("payload")).as("byte_len"),
        ceil(length(col("payload")) / lit(256.0)).cast("long").as("n_frames"),
        md5(col("payload")).as("checksum")))
  }

  /** STUB decoder (deterministic fake): splitmix64 over a byte-hash
    * seed, `dim` floats in (-1, 1). Replace with a real codec where
    * one exists — the pipeline contract around it does not change. */
  def fakeDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    var seed = 0x9e3779b97f4a7c15L
    var i = 0
    while (i < payload.length) { seed = seed * 31 + payload(i); i += 1 }
    val out = new Array[Float](dim)
    var j = 0
    while (j < dim) {
      var z = seed + 0x9e3779b97f4a7c15L * (j + 1)
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      out(j) = ((z ^ (z >>> 31)).toDouble / Long.MaxValue.toDouble).toFloat
      j += 1
    }
    out
  }

  /** Batched feature extraction: rows are processed in fixed-size
    * batches (whole batch decoded before any row is emitted — the
    * same batch contract as an Arrow/pandas UDF), appending an
    * `array<float>` feature column. Distributes per partition; no
    * driver involvement. */
  def extractFeatures(df: DataFrame, payloadCol: String, dim: Int,
                      batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    implicit val enc = Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val feats = batch.map(r => fakeDecode(r.getAs[Array[Byte]](idx), dim))
        batch.lazyZip(feats).map((r, f) => Row.fromSeq(r.toSeq :+ f))
      }
    }
  }

  /** Frame sampler: every `every`-th fixed-size byte window of the
    * payload as an array<binary> — pure Column plumbing (substr on
    * binary), no decode needed. */
  def frameSample(payload: Column, frameSize: Int, every: Int): Column = {
    val nFrames = ceil(length(payload) / lit(frameSize.toDouble)).cast("int")
    transform(
      sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(every)),
      i => payload.substr((i * frameSize + 1).cast("int"), lit(frameSize)))
  }
}
