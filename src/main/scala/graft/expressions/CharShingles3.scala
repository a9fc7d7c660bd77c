package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct packed character 3-grams of a string — the native kernel
  * behind [[graft.functions.TextFns.charShinglesPacked]]. One pass
  * over the codepoints replaces the HOF formulation
  * (`split("") → 3 slices → 2 zip_with → array_distinct`), which
  * materializes a per-character string array and runs interpreted
  * lambda bodies per element — the dominant cost of every shingle
  * stage (q34/q102/q106) once those stages were spread across cores.
  *
  * Bit-identical to the HOF formulation (pinned in DedupSpec, astral
  * case included):
  *  - elements are codepoints, as `split(text, "")` yields;
  *  - each is valued like `ascii(...)`, which returns the full
  *    CODEPOINT (`codePointAt`, not the first UTF-16 unit — the
  *    parity spec's emoji case caught the wrong guess);
  *  - shingle = v0 * 2^42 + v1 * 2^21 + v2;
  *  - distinct preserves first-occurrence order (`array_distinct`);
  *  - fewer than 3 codepoints → empty array.
  */
case class CharShingles3(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(s: Any): Any =
    CharShingles3.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.expressions.CharShingles3.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): CharShingles3 =
    copy(child = newChild)
}

object CharShingles3 {
  private val EMPTY = new GenericArrayData(Array.empty[Long])

  /** Called from both interpreted eval and generated code. */
  def compute(s: UTF8String): ArrayData = {
    val str = s.toString
    val len = str.length
    // one codepoint per split element, valued ascii-style (full cp)
    var ncp = 0
    var i = 0
    while (i < len) { ncp += 1; i += Character.charCount(str.codePointAt(i)) }
    if (ncp < 3) return EMPTY
    val vals = new Array[Int](ncp)
    i = 0
    var k = 0
    while (i < len) {
      val cp = str.codePointAt(i)
      vals(k) = cp
      k += 1
      i += Character.charCount(cp)
    }
    val m = ncp - 2
    // open-addressing dedup, first-occurrence order out
    var cap = 4
    while (cap < (m << 1)) cap <<= 1
    val table = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val out = new Array[Long](m)
    var cnt = 0
    var j = 0
    while (j < m) {
      val v = vals(j).toLong * (1L << 42) + vals(j + 1).toLong * (1L << 21) + vals(j + 2)
      // finalizer-style mix so sequential packs don't cluster
      val mixed = v * -7046029254386353131L
      var h = ((mixed ^ (mixed >>> 32)).toInt) & (cap - 1)
      var found = false
      while (used(h) && !found) {
        if (table(h) == v) found = true else h = (h + 1) & (cap - 1)
      }
      if (!found) {
        used(h) = true; table(h) = v; out(cnt) = v; cnt += 1
      }
      j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, cnt))
  }
}
