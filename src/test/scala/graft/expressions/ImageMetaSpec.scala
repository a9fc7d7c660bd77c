package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** [[ImageMeta]] — real-wire-format header decode over untrusted
  * bytes. Pins: a REAL 1×1 PNG (valid CRCs) and a constructed
  * baseline JPEG parse to their known fields; interpreted/codegen
  * parity; and the malformed-payload contract (truncation, garbage,
  * and the crafted near-Int.MaxValue chunk length that would wrap the
  * chunk-walk cursor) — NULL, never an exception. */
class ImageMetaSpec extends SparkSpec {
  import spark.implicits._

  /** The canonical 1×1 transparent PNG: 8-bit RGBA, valid CRCs —
    * pins that the chunk walk is CRC-agnostic on a real file. */
  private val onePxPng: Array[Byte] = java.util.Base64.getDecoder.decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNkYPhf" +
      "DwAChwGA60e6kgAAAABJRU5ErkJggg==")

  private def hexBytes(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2)
      .map(java.lang.Integer.parseInt(_, 16).toByte).toArray

  /** Baseline JFIF: SOI, APP0, a DQT to skip, then SOF0 h=2 w=3 with
    * 3 components — the marker-segment scan must hop the tables. */
  private val baselineJpeg: Array[Byte] = hexBytes(
    "FFD8" +
      "FFE000104A46494600010100000100010000" +
      "FFDB0043" + "00" * 65 +
      "FFC00011" + "08" + "0002" + "0003" + "03" +
      "011100" + "021101" + "031101")

  private def viaDf(bytes: Array[Byte]): Option[Row] = {
    val r = Seq(Tuple1(bytes)).toDF("p")
      .select(ColumnBridge.column(
        ImageMeta(ColumnBridge.expression(col("p")))).as("m"))
      .head()
    if (r.isNullAt(0)) None else Some(r.getStruct(0))
  }

  private def interpreted(bytes: Array[Byte]): Option[(String, Int, Int, Int, Int)] =
    Option(ImageMeta(Literal(bytes, BinaryType)).eval(null))
      .map(_.asInstanceOf[InternalRow])
      .map(r => (r.getUTF8String(0).toString, r.getInt(1), r.getInt(2),
        r.getInt(3), r.getInt(4)))

  private def both(bytes: Array[Byte]): Option[(String, Int, Int, Int, Int)] = {
    val df = viaDf(bytes).map(r => (r.getString(0), r.getInt(1), r.getInt(2),
      r.getInt(3), r.getInt(4)))
    assert(df == interpreted(bytes), "codegen and interpreted paths disagree")
    df
  }

  test("real 1x1 PNG: 8-bit RGBA, CRC-agnostic walk") {
    assert(both(onePxPng).contains(("png", 1, 1, 8, 4)))
  }

  test("baseline JPEG: scan hops APP0/DQT to SOF0") {
    assert(both(baselineJpeg).contains(("jpeg", 3, 2, 8, 3)))
  }

  test("PNG color types map to channel counts per spec") {
    def png(ctype: Int, w: Int = 7, h: Int = 5): Array[Byte] = hexBytes(
      "89504E470D0A1A0A" + "0000000D49484452" +
        f"$w%08X$h%08X" + "08" + f"$ctype%02X" + "000000" + "DEADBEEF")
    assert(both(png(0)).contains(("png", 7, 5, 8, 1)))
    assert(both(png(2)).contains(("png", 7, 5, 8, 3)))
    assert(both(png(3)).contains(("png", 7, 5, 8, 1)))
    assert(both(png(4)).contains(("png", 7, 5, 8, 2)))
    assert(both(png(6)).contains(("png", 7, 5, 8, 4)))
    assert(both(png(5)).isEmpty) // undefined color type -> malformed
  }

  test("PNG: a leading non-IHDR chunk degrades to a scan, not a miss") {
    val leading = hexBytes(
      "89504E470D0A1A0A" +
        "00000001" + "74455874" + "41" + "00000000" + // 1-byte tEXt
        "0000000D49484452" + "00000010" + "00000020" +
        "08" + "02" + "000000" + "00000000")
    assert(both(leading).contains(("png", 16, 32, 8, 3)))
  }

  test("malformed payloads yield NULL, never an exception") {
    val cases = Seq[Array[Byte]](
      Array.emptyByteArray,
      "not an image at all".getBytes,
      onePxPng.take(20),                       // truncated mid-IHDR
      onePxPng.take(12),                       // truncated mid-length
      baselineJpeg.take(10),                   // truncated mid-APP0
      hexBytes("FFD8FFDA0004ABCD"),            // SOS before any SOF
      hexBytes("FFD8FFD9"),                    // SOI then EOI
      hexBytes("FFD812"),                      // lost marker sync
      // crafted chunk length near Int.MaxValue: the p += 12 + len
      // advance would wrap negative without the overflow guard
      hexBytes("89504E470D0A1A0A" + "7FFFFFF0" + "41424344" + "0000"),
      hexBytes("89504E470D0A1A0A" + "FFFFFFFF" + "41424344"), // len < 0
      // declared JPEG segment length running past the buffer
      hexBytes("FFD8" + "FFE0" + "FFFF" + "4A46"),
      // SOF0 with a declared length too short for its own fields: the
      // dims bytes belong to the NEXT segment — garbage, not metadata
      hexBytes("FFD8" + "FFC0" + "0002" + "08" + "0002" + "0003" + "03" +
        "011100021101031101"),
      // SOF0 whose declared length cannot hold its component specs
      hexBytes("FFD8" + "FFC00009" + "08" + "0002" + "0003" + "03" +
        "011100021101031101"),
      // IHDR chunk declaring len < 13: its "fields" are the next
      // chunk's bytes
      hexBytes("89504E470D0A1A0A" + "00000005" + "49484452" +
        "0000001000000020080200" + "00000000"))
    cases.foreach { b =>
      assert(both(b).isEmpty, s"expected NULL for ${b.toSeq}")
    }
  }
}
