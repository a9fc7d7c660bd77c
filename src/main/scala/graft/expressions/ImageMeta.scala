package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Binary-format IMAGE HEADER decode — a real decoder over the opaque
  * `binary` media payload (reference: media ingest attaches
  * width/height metadata at load; here the bytes themselves are the
  * source of truth). Recognizes the two dominant raster containers by
  * their actual wire format:
  *
  *  - PNG: 8-byte signature `89 50 4E 47 0D 0A 1A 0A`, then a chunk
  *    walk (4-byte big-endian length, 4-byte type, payload, 4-byte
  *    CRC) to `IHDR`: width/height as BE32, bit depth and color type
  *    as single bytes. Channel count derives from color type per the
  *    PNG spec (0 gray→1, 2 truecolor→3, 3 palette→1, 4 gray+α→2,
  *    6 RGBA→4). Chunk CRCs are NOT verified — this is a header
  *    sniffer (the `file(1)` / ImageMagick `ping` contract), and the
  *    spec's real-world fixture (a canonical 1×1 PNG with a valid
  *    CRC) pins that the walk is CRC-agnostic.
  *  - JPEG/JFIF: `FF D8` SOI, then a marker-segment scan (2-byte
  *    marker, 2-byte big-endian length INCLUDING itself) skipping
  *    APP0/COM/DQT/… by their declared lengths until the first SOFn
  *    frame header (C0–CF minus DHT C4 / JPG C8 / DAC CC): sample
  *    precision byte, height/width as BE16, component count byte.
  *    Scan stops at SOS (`FF DA`) or EOI (`FF D9`) — dimensions
  *    behind the entropy stream would mean a malformed baseline file.
  *
  * Anything else — wrong magic, truncated header, chunk/segment
  * lengths running past the buffer — yields NULL (the curation
  * pipeline's "unparseable media" bucket), never an exception: at
  * 100 TB a poisoned payload must cost one null, not a task retry
  * loop.
  *
  * Codegen follows the house static-call pattern ([[CharShingles3]]):
  * interpreted eval and generated code share ONE `compute` kernel, so
  * the two paths cannot diverge (parity pinned in ImageMetaSpec over
  * real, constructed, truncated and non-image payloads).
  */
case class ImageMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ImageMeta.schema

  // parse failure yields a NULL struct even for a non-null payload
  override def nullable: Boolean = true

  override def nullSafeEval(b: Any): Any =
    ImageMeta.compute(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
       |${ev.value} = graft.expressions.ImageMeta.compute($b);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): ImageMeta =
    copy(child = newChild)
}

object ImageMeta {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("depth", IntegerType, nullable = false),
    StructField("nchan", IntegerType, nullable = false)))

  private val PNG = UTF8String.fromString("png")
  private val JPEG = UTF8String.fromString("jpeg")

  private def be32(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xff) << 24) | ((b(p + 1) & 0xff) << 16) |
      ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)

  private def be16(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)

  private def row(fmt: UTF8String, w: Int, h: Int, d: Int, c: Int): InternalRow =
    new GenericInternalRow(Array[Any](fmt, w, h, d, c))

  /** Called from both interpreted eval and generated code; null for
    * anything that is not a parseable PNG/JPEG header. */
  def compute(b: Array[Byte]): InternalRow = {
    val n = b.length
    if (n >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
        b(3) == 'G' && (b(4) & 0xff) == 0x0d && b(5) == 0x0a &&
        (b(6) & 0xff) == 0x1a && b(7) == 0x0a) {
      // PNG chunk walk (IHDR is first per spec; walk anyway so a
      // nonstandard leading chunk degrades to a scan, not a miss)
      var p = 8
      while (p + 8 <= n) {
        val len = be32(b, p)
        if (len < 0) return null // > 2 GiB chunk length: malformed
        // chunk payload+CRC past the buffer: reject BEFORE advancing —
        // `p += 12 + len` with len near Int.MaxValue would wrap p
        // negative and turn the loop guard into an out-of-bounds read
        // (n - p - 12 cannot overflow: 8 <= p <= n - 8)
        if (len > n - p - 12) return null
        if (b(p + 4) == 'I' && b(p + 5) == 'H' && b(p + 6) == 'D' &&
            b(p + 7) == 'R') {
          // the 13 IHDR fields must lie inside the DECLARED chunk, not
          // merely inside the buffer — an IHDR with len < 13 would
          // otherwise decode the next chunk's bytes as dimensions
          if (len < 13) return null
          if (p + 8 + 13 > n) return null
          val w = be32(b, p + 8); val h = be32(b, p + 12)
          if (w <= 0 || h <= 0) return null
          val depth = b(p + 16) & 0xff
          val nchan = (b(p + 17) & 0xff) match {
            case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
            case _ => return null
          }
          return row(PNG, w, h, depth, nchan)
        }
        p += 12 + len // length + type(4) + crc(4)
      }
      null
    } else if (n >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      // JPEG marker-segment scan to the first frame header
      var p = 2
      while (p + 4 <= n) {
        if ((b(p) & 0xff) != 0xff) return null // lost marker sync
        val m = b(p + 1) & 0xff
        if (m == 0xff) { p += 1 } // fill byte before a marker
        else if (m == 0xd9 || m == 0xda) return null // EOI / SOS first
        else if ((m >= 0xd0 && m <= 0xd8) || m == 0x01) { p += 2 } // standalone
        else {
          val len = be16(b, p + 2)
          if (len < 2 || len > n - p - 2) return null // runs past buffer
          val sofn = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
          if (sofn) {
            if (p + 10 > n) return null
            // frame-header fields must lie inside the DECLARED segment
            // (len counts itself; precision..nchan end at offset 8):
            // an FFC0 with len < 8 would otherwise decode the next
            // segment's bytes as dimensions
            if (len < 8) return null
            val depth = b(p + 4) & 0xff
            val h = be16(b, p + 5); val w = be16(b, p + 7)
            val nchan = b(p + 9) & 0xff
            if (w == 0 || h == 0 || nchan == 0) return null
            // the declared segment must also hold the 3-byte component
            // specs a real SOFn carries
            if (len < 8 + 3 * nchan) return null
            return row(JPEG, w, h, depth, nchan)
          }
          p += 2 + len
        }
      }
      null
    } else null
  }
}
