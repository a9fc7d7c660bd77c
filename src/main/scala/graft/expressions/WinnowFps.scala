package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
  * SIGMOD'03 — the MOSS algorithm): Rabin-Karp ROLLING hashes of the
  * k-codepoint grams, then the minimum of each w-wide window of
  * consecutive gram hashes, returned as a SORTED DISTINCT
  * `array<bigint>`. Winnowing guarantees any shared substring of
  * length ≥ k+w−1 contributes a shared fingerprint, at ~1/w the
  * density of the full gram set — the position-robust containment
  * fingerprint that set-based shingles (Jaccard/minhash) are not.
  *
  * One forward pass per row: the head gram folds `h = (h·B + c) mod
  * M`; each subsequent gram updates in O(1) by retiring the left
  * codepoint (`h += M − c·B^{k−1} mod M`) and admitting the right —
  * the "rolling" in rolling hash, O(n) total vs O(n·k) naive.
  * Elements are CODEPOINTS (DuckDB `ord` / Spark `ascii` semantics,
  * same discipline as [[CharShingles3]]), and all arithmetic stays
  * in [0, M·B + 2^21] ⊂ long, ANSI-safe. M = 2^31−1 (prime), B =
  * 257: both engines replay the identical integer sequence, so the
  * oracle rebuilds every fingerprint exactly (per-gram left-folded
  * `(acc·B + c) mod M` — congruent to the rolling form and equal
  * because both stay reduced).
  *
  * Fewer grams than w → one window over what exists; no grams
  * (fewer than k codepoints) → empty array.
  */
case class WinnowFps(child: Expression, k: Int, w: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(s: Any): Any =
    WinnowFps.compute(s.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.expressions.WinnowFps.compute($s, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)

  override def prettyName: String = "winnow_fps"
}

object WinnowFps {
  val Base = 257L
  val Mod = 2147483647L // 2^31 − 1, prime
  private val EMPTY = new GenericArrayData(Array.empty[Long])

  /** Called from both interpreted eval and generated code. */
  def compute(s: UTF8String, k: Int, w: Int): ArrayData = {
    val str = s.toString
    val len = str.length
    // codepoint array (ascii()/ord() semantics, astral-safe)
    var ncp = 0
    var i = 0
    while (i < len) { ncp += 1; i += Character.charCount(str.codePointAt(i)) }
    val g = ncp - k + 1
    if (g <= 0) return EMPTY
    val cps = new Array[Int](ncp)
    i = 0
    var ci = 0
    while (i < len) {
      val cp = str.codePointAt(i)
      cps(ci) = cp; ci += 1
      i += Character.charCount(cp)
    }
    // B^{k−1} mod M for the retiring term
    var bk = 1L
    var j = 0
    while (j < k - 1) { bk = bk * Base % Mod; j += 1 }
    // rolling gram hashes
    val hs = new Array[Long](g)
    var h = 0L
    j = 0
    while (j < k) { h = (h * Base + cps(j)) % Mod; j += 1 }
    hs(0) = h
    i = 1
    while (i < g) {
      h = (h + Mod - cps(i - 1) * bk % Mod) % Mod
      h = (h * Base + cps(i + k - 1)) % Mod
      hs(i) = h
      i += 1
    }
    // window minima (one window when g ≤ w)
    val nw = if (g <= w) 1 else g - w + 1
    val ww = if (g <= w) g else w
    val wins = new Array[Long](nw)
    j = 0
    while (j < nw) {
      var m = hs(j)
      var t = 1
      while (t < ww) { val v = hs(j + t); if (v < m) m = v; t += 1 }
      wins(j) = m
      j += 1
    }
    // sorted distinct
    java.util.Arrays.sort(wins)
    var n = 1
    i = 1
    while (i < nw) {
      if (wins(i) != wins(n - 1)) { wins(n) = wins(i); n += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(wins, n))
  }
}
