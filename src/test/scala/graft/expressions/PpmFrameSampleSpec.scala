package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** [[PpmFrameSample]] contract: exact frame slices on the sampled
  * indices, strict whole-payload rejection on any malformation, and
  * composition with [[PpmResize]] (a sampled frame IS a valid P6
  * payload). Driven through the DataFrame API so the Generate-node
  * path (not just expression eval) is what's tested. */
class PpmFrameSampleSpec extends SparkSpec {

  /** One P6 frame: header (optional comment) + deterministic pixels. */
  private def frame(w: Int, h: Int, seed: Int, comment: Boolean = false): Array[Byte] = {
    val hdr = (s"P6\n" + (if (comment) s"# c$seed\n" else "") + s"$w $h\n255\n")
      .getBytes("US-ASCII")
    val pix = Array.tabulate(w * h * 3)(i => ((i * 31 + seed * 7) % 256).toByte)
    hdr ++ pix
  }

  private def sample(payload: Array[Byte], every: Int): Seq[(Int, Int, Array[Byte])] = {
    import spark.implicits._
    val df = Seq(Tuple1(payload)).toDF("payload")
    val gen = ColumnBridge.column(PpmFrameSample(
      ColumnBridge.expression(col("payload")), every))
    df.select(gen.as(Seq("frame_idx", "n_frames", "frame")))
      .orderBy("frame_idx")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getAs[Array[Byte]]("frame")))
      .toSeq
  }

  test("every-2nd sampling emits exact original byte slices") {
    val f0 = frame(3, 2, 1, comment = true)
    val f1 = frame(2, 2, 2)
    val f2 = frame(4, 1, 3, comment = true)
    val out = sample(f0 ++ f1 ++ f2, every = 2)
    assert(out.map(_._1) == Seq(0, 2))
    assert(out.forall(_._2 == 3))
    assert(java.util.Arrays.equals(out(0)._3, f0))
    assert(java.util.Arrays.equals(out(1)._3, f2))
  }

  test("every=1 emits all frames; a single frame round-trips") {
    val f0 = frame(2, 3, 9)
    val out = sample(f0, every = 1)
    assert(out.map(_._1) == Seq(0) && out.head._2 == 1)
    assert(java.util.Arrays.equals(out.head._3, f0))
  }

  test("malformed payloads yield ZERO rows — never partial output") {
    val good = frame(3, 2, 1)
    // truncated second frame (pixel block cut short)
    assert(sample(good ++ frame(5, 5, 2).dropRight(4), 1).isEmpty)
    // trailing garbage after a valid frame
    assert(sample(good ++ "JUNK".getBytes("US-ASCII"), 1).isEmpty)
    // bad magic mid-stream
    assert(sample(good ++ frame(2, 2, 3).updated(0, 'X'.toByte), 1).isEmpty)
    // not an image at all / empty
    assert(sample("#hello world".getBytes("US-ASCII"), 1).isEmpty)
    assert(sample(Array.emptyByteArray, 1).isEmpty)
  }

  test("null payload yields zero rows through the Generate path") {
    import spark.implicits._
    val df = Seq(Tuple1(null: Array[Byte])).toDF("payload")
    val gen = ColumnBridge.column(PpmFrameSample(
      ColumnBridge.expression(col("payload")), 2))
    assert(df.select(gen.as(Seq("frame_idx", "n_frames", "frame"))).count() == 0)
  }

  test("sampled frames compose with PpmResize") {
    val f0 = frame(4, 4, 5, comment = true)
    val f1 = frame(3, 3, 6)
    val out = sample(f0 ++ f1, every = 2)
    assert(out.size == 1)
    val resized = PpmResize.compute(out.head._3, 2, 2)
    assert(resized != null)
    // a resize output is itself a complete P6 the walker accepts
    assert(sample(resized, 1).size == 1)
  }

  test("stride must be positive at construction") {
    intercept[IllegalArgumentException] {
      PpmFrameSample(ColumnBridge.expression(lit(Array[Byte]())), 0)
    }
  }
}
