package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** [[PpmResize]] — real nearest-neighbor resize over P6 bitmaps.
  * Pins: identity resize preserves pixel data; a hand-checked
  * downsample picks exactly the nearest-neighbor source pixels;
  * header parsing handles comments and whitespace runs; and the
  * malformed contract (bad magic, maxval ≠ 255, truncation, overflow
  * dims) yields NULL on both the interpreted and codegen paths. */
class PpmResizeSpec extends SparkSpec {
  import spark.implicits._

  /** Build a P6 image whose pixel (x, y, c) = (x*10 + y*100 + c) % 256. */
  private def ppm(w: Int, h: Int, comment: Boolean = false,
      maxval: Int = 255): Array[Byte] = {
    val hdr = (if (comment) s"P6\n# a comment\n$w $h\n$maxval\n"
               else s"P6\n$w $h\n$maxval\n").getBytes("US-ASCII")
    val pix = Array.tabulate(w * h * 3) { i =>
      val (p, c) = (i / 3, i % 3)
      ((p % w) * 10 + (p / w) * 100 + c).toByte
    }
    hdr ++ pix
  }

  private def viaDf(bytes: Array[Byte], tw: Int, th: Int): Option[Array[Byte]] = {
    val r = Seq(Tuple1(bytes)).toDF("p")
      .select(ColumnBridge.column(PpmResize(
        ColumnBridge.expression(col("p")), tw, th)).as("r"))
      .head()
    if (r.isNullAt(0)) None else Some(r.getAs[Array[Byte]](0))
  }

  private def both(bytes: Array[Byte], tw: Int, th: Int): Option[Seq[Byte]] = {
    val df = viaDf(bytes, tw, th).map(_.toSeq)
    val interp = Option(PpmResize(Literal(bytes, BinaryType), tw, th)
      .eval(null)).map(_.asInstanceOf[Array[Byte]].toSeq)
    assert(df == interp, "codegen and interpreted paths disagree")
    df
  }

  test("identity resize re-emits the pixel data under a fresh header") {
    val img = ppm(4, 3)
    val out = both(img, 4, 3).get
    val hdr = "P6\n4 3\n255\n".getBytes("US-ASCII").toSeq
    assert(out.take(hdr.length) == hdr)
    assert(out.drop(hdr.length) == img.toSeq.drop("P6\n4 3\n255\n".length))
  }

  test("downsample picks the nearest-neighbor source pixels") {
    // 4x2 -> 2x1: tx*4/2 = {0, 2}; ty*2/1 = {0} — pixels (0,0), (2,0)
    val out = both(ppm(4, 2), 2, 1).get.drop("P6\n2 1\n255\n".length)
    val expected = Seq(0, 1, 2, 20, 21, 22).map(_.toByte)
    assert(out == expected, out.toString)
  }

  test("upsample replicates source pixels") {
    // 1x1 -> 3x2: every output pixel reads source (0,0) = (0,1,2)
    val out = both(ppm(1, 1), 3, 2).get.drop("P6\n3 2\n255\n".length)
    assert(out == Seq.fill(6)(Seq(0, 1, 2)).flatten.map(_.toByte))
  }

  test("header comments and whitespace runs parse per the netpbm spec") {
    assert(both(ppm(4, 3, comment = true), 2, 2) == both(ppm(4, 3), 2, 2))
    // multi-whitespace between tokens
    val weird = ("P6  \n\t4\n# mid\n 3\n255\n").getBytes("US-ASCII") ++
      Array.tabulate(4 * 3 * 3)(i => ((i / 3 % 4) * 10 + (i / 3 / 4) * 100 + i % 3).toByte)
    assert(both(weird, 2, 2) == both(ppm(4, 3), 2, 2))
  }

  test("malformed payloads yield NULL, never an exception") {
    val cases = Seq[Array[Byte]](
      Array.emptyByteArray,
      "plain text".getBytes,
      "#P6\n4 3\n255\n".getBytes,          // comment before magic
      ppm(4, 3).take(15),                  // truncated pixel data
      ppm(4, 3, maxval = 254),             // only maxval 255 supported
      "P6\n0 3\n255\n".getBytes,           // zero width
      "P6\n4 -3\n255\n".getBytes,          // negative height
      "P6\n4 3\n255".getBytes,             // missing post-maxval ws
      // dims whose byte count overflows int: long guard, not a crash
      "P6\n2000000000 2000000000\n255\n".getBytes)
    cases.foreach(b => assert(both(b, 2, 2).isEmpty, s"expected NULL: ${b.toSeq}"))
  }
}
