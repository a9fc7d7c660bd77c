package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[TextFns.winnowFingerprints]] ([[graft.expressions.WinnowFps]]):
  * the O(1)-rolling gram hash must equal the definitional per-gram
  * left fold the DuckDB oracle runs, and the window/dedup semantics
  * must hold at every boundary. */
class WinnowFpsSpec extends SparkSpec {
  import spark.implicits._

  private val B = 257L
  private val M = 2147483647L

  /** Reference implementation: the oracle's form — per-gram left
    * fold (acc·B + codepoint) mod M, then window minima, sorted
    * distinct. */
  private def reference(text: String, k: Int, w: Int): Seq[Long] = {
    val cps = text.codePoints().toArray
    val g = cps.length - k + 1
    if (g <= 0) return Seq.empty
    val hs = (0 until g).map { i =>
      (i until i + k).foldLeft(0L)((acc, j) => (acc * B + cps(j)) % M)
    }
    val wins =
      if (g <= w) Seq(hs.min)
      else (0 to g - w).map(j => hs.slice(j, j + w).min)
    wins.distinct.sorted
  }

  private def viaExpr(text: String, k: Int = 8, w: Int = 4): Seq[Long] =
    Seq(text).toDF("t")
      .select(TextFns.winnowFingerprints(col("t"), k, w).as("fps"))
      .head().getSeq[Long](0)

  test("rolling hash equals the definitional per-gram fold") {
    val rnd = new scala.util.Random(42)
    val alpha = "abcdefghij XYZ0123"
    for (_ <- 1 to 25) {
      val s = Seq.fill(rnd.nextInt(80) + 8)(alpha(rnd.nextInt(alpha.length)))
        .mkString
      assert(viaExpr(s) === reference(s, 8, 4), s"text=$s")
    }
  }

  test("shared substring of length >= k+w-1 yields a shared fingerprint") {
    val core = "the quick brown fox jumps"
    val a = s"AAAA $core BBBB"
    val b = s"XXXXXXX $core YYY"
    assert(viaExpr(a).toSet.intersect(viaExpr(b).toSet).nonEmpty)
  }

  test("boundaries: short text, exactly k, fewer grams than w") {
    assert(viaExpr("1234567") === Seq.empty) // < k codepoints
    assert(viaExpr("12345678") === reference("12345678", 8, 4)) // one gram
    assert(viaExpr("123456789") === reference("123456789", 8, 4)) // g=2 < w
  }

  test("astral codepoints hash as codepoints, not UTF-16 units") {
    val s = "😀ab😁cdefgh" // emoji are 1 codepoint each
    assert(viaExpr(s) === reference(s, 8, 4))
  }
}
