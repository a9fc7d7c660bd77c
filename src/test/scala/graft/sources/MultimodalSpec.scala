package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the multimodal plumbing contracts: binary schema + metadata,
  * deterministic batch decode, and byte-window frame sampling. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("mediaTable: binary payload with typed metadata struct") {
    val m = Multimodal.mediaTable(spark, "/root/testdata/sf0.001")
    val row = m.orderBy("media_id").first()
    assert(m.schema("payload").dataType.typeName == "binary")
    val meta = row.getStruct(row.fieldIndex("meta"))
    assert(meta.getAs[Int]("byte_len") > 0)
    assert(meta.getAs[String]("checksum").length == 32)
    assert(Set("image", "audio", "video").contains(row.getAs[String]("modality")))
  }

  test("extractFeatures: expression-decoded array column, stable per row") {
    val df = Seq((1L, "aa".getBytes), (2L, "bb".getBytes), (3L, "aa".getBytes))
      .toDF("id", "payload")
    val out = Multimodal.extractFeatures(df, "payload", dim = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    assert(out(1).length == 8)
    assert(out(1) == out(3)) // same bytes -> same features (determinism)
    assert(out(1) != out(2))
  }

  test("extractFeatures: no object boundary — decode rides codegen, not mapPartitions") {
    val df = Seq((1L, "aa".getBytes)).toDF("id", "payload")
    val plan = Multimodal.extractFeatures(df, "payload", dim = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SerializeFromObject") &&
      !plan.contains("DeserializeToObject") && !plan.contains("MapPartitions"), plan)
  }

  test("frameSample: every k-th fixed-size byte window") {
    val payload = (0 until 10).map(_.toByte).toArray // 10 bytes, frame=4 -> 3 frames
    val df = Seq(Tuple1(payload)).toDF("p")
      .select(Multimodal.frameSample(col("p"), frameSize = 4, every = 2).as("frames"))
    val frames = df.first().getSeq[Array[Byte]](0)
    assert(frames.length == 2) // frames 0 and 2
    assert(frames(0).toSeq == (0 until 4).map(_.toByte))
    assert(frames(1).toSeq == (8 until 10).map(_.toByte)) // tail frame short
  }
}
