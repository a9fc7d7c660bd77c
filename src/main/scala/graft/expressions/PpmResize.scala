package graft.expressions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** REAL nearest-neighbor image resize over a raw-bitmap payload — the
  * `resize` step of the multimodal tier (builder brief: decode /
  * feature-extract / resize / frame-sample), runnable with zero codec
  * dependencies because the wire format is PPM `P6` (the simplest
  * public raster format: ASCII header `P6 <w> <h> <maxval>` with
  * `#`-comment and whitespace rules per the netpbm spec, then
  * `w*h*3` raw RGB bytes). The header parse is a real parser —
  * comments anywhere between tokens, any whitespace runs, exactly
  * one whitespace byte after maxval — and the resample is standard
  * nearest-neighbor: output pixel (tx, ty) reads source pixel
  * (tx*w/outW, ty*h/outH) in integer arithmetic. Output is a
  * complete P6 image (`P6\n<outW> <outH>\n255\n` + bytes), so
  * resizes compose.
  *
  * Malformed payloads — wrong magic, non-digit dims, maxval ≠ 255
  * (binary P6 with 2-byte samples is out of scope), truncated pixel
  * data, dimensions whose byte count overflows — yield NULL, never
  * an exception ([[ImageMeta]]'s untrusted-media contract: at 100 TB
  * a poisoned payload must cost one null, not a task retry loop).
  *
  * Codegen follows the house static-call pattern ([[CharShingles3]]):
  * interpreted eval and generated code share ONE `compute` kernel
  * (parity pinned in PpmResizeSpec).
  */
case class PpmResize(child: Expression, outW: Int, outH: Int)
    extends UnaryExpression {
  require(outW > 0 && outH > 0, "PpmResize: output dims must be positive")
  // output-side overflow guard: the per-row buffer is
  // header + outW*outH*3 bytes in ONE Int-sized array — a misconfigured
  // plan must fail at construction, not throw
  // NegativeArraySizeException per row (the null-never-throw contract
  // covers untrusted INPUT; configured OUTPUT dims are plan-time state)
  require(outW.toLong * outH * 3 + 32 <= Int.MaxValue,
    s"PpmResize: output $outW x $outH overflows a byte-array buffer")

  override def dataType: DataType = BinaryType

  // parse failure yields NULL even for a non-null payload
  override def nullable: Boolean = true

  override def nullSafeEval(b: Any): Any =
    PpmResize.compute(b.asInstanceOf[Array[Byte]], outW, outH)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
       |${ev.value} = graft.expressions.PpmResize.compute($b, $outW, $outH);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): PpmResize =
    copy(child = newChild)
}

object PpmResize {

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == '\f' || b == 0x0b

  /** Parse one P6 header starting at `off`: magic, `#`-commented
    * whitespace-separated width/height/maxval(=255), the single
    * whitespace byte before pixel data, and the truncation/overflow
    * guard on the pixel block. Returns `[w, h, dataStart]` or null
    * for anything malformed — shared by [[compute]] and the
    * multi-frame walker ([[PpmFrameSample]]), so the two multimodal
    * ops cannot drift on netpbm edge cases. */
  private[expressions] def parseP6Header(b: Array[Byte], off: Int): Array[Int] = {
    val n = b.length
    if (off < 0 || off + 2 > n || b(off) != 'P' || b(off + 1) != '6') return null
    var p = off + 2
    // token separator: whitespace runs with '#' comments to end-of-line
    def skipWs(): Boolean = {
      val start = p
      while (p < n && (isWs(b(p)) || b(p) == '#')) {
        if (b(p) == '#') { while (p < n && b(p) != '\n') p += 1 }
        else p += 1
      }
      p > start
    }
    // nonnegative ASCII integer; -1 on malformed or > Int.MaxValue
    def readInt(): Int = {
      if (p >= n || b(p) < '0' || b(p) > '9') return -1
      var v = 0L
      while (p < n && b(p) >= '0' && b(p) <= '9') {
        v = v * 10 + (b(p) - '0')
        if (v > Int.MaxValue) return -1
        p += 1
      }
      v.toInt
    }
    if (!skipWs()) return null
    val w = readInt(); if (w <= 0) return null
    if (!skipWs()) return null
    val h = readInt(); if (h <= 0) return null
    if (!skipWs()) return null
    val maxv = readInt(); if (maxv != 255) return null
    // exactly ONE whitespace byte separates maxval from pixel data
    if (p >= n || !isWs(b(p))) return null
    p += 1
    // truncation / overflow guard: w·h ≤ 2^62 cannot overflow a long,
    // and `need > avail/3` ⟺ `need*3 > avail` under floor division —
    // the naive `w*h*3 > avail` would itself overflow at 2^31-scale
    // dims and wrap the guard off
    if (w.toLong * h > ((n - p) / 3).toLong) return null
    Array(w, h, p)
  }

  /** Called from both interpreted eval and generated code; null for
    * anything that is not a complete, well-formed P6 image. */
  def compute(b: Array[Byte], tw: Int, th: Int): Array[Byte] = {
    val hd = parseP6Header(b, 0)
    if (hd == null) return null
    val w = hd(0); val h = hd(1); val p = hd(2)
    val header = s"P6\n$tw $th\n255\n".getBytes(StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + tw * th * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var o = header.length
    var ty = 0
    while (ty < th) {
      val sy = (ty.toLong * h / th).toInt
      var tx = 0
      while (tx < tw) {
        val sx = (tx.toLong * w / tw).toInt
        val src = p + (sy * w + sx) * 3
        out(o) = b(src); out(o + 1) = b(src + 1); out(o + 2) = b(src + 2)
        o += 3
        tx += 1
      }
      ty += 1
    }
    out
  }
}
