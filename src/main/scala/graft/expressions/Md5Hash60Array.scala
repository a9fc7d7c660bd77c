package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Per-element [[graft.functions.DedupFns.portableHash60]] over an
  * array<string> column — `conv(substring(md5(x), 1, 15), 16, 10)`
  * for every element, optionally reduced `% mod` (mod > 0), in ONE
  * native pass. Replaces `transform(arr, x => portableHash60(x))`:
  * HOF lambda bodies are interpreted per element, and the lambda-eval
  * machinery (not md5 itself) dominated the minhash/simhash hashing
  * stage. Produces bit-identical longs to the Column formulation
  * (pinned in DedupSpec): the first 15 hex chars of the digest are
  * its first 7 bytes plus the high nibble of the 8th, assembled
  * big-endian.
  *
  * Precondition (guaranteed by the tokenizers): no null elements.
  */
case class Md5Hash60Array(child: Expression, mod: Long = 0L)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    Md5Hash60Array.hashAll(a.asInstanceOf[ArrayData], mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.Md5Hash60Array.hashAll($a, ${mod}L);")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash60Array =
    copy(child = newChild)
}

object Md5Hash60Array {
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Called from both interpreted eval and generated code. */
  def hashAll(arr: ArrayData, mod: Long): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    val md = mdLocal.get()
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(arr.getUTF8String(i).getBytes)
      var v = 0L
      var j = 0
      while (j < 7) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
      v = (v << 4) | ((d(7) & 0xf0L) >>> 4)
      out(i) = if (mod > 0) v % mod else v
      i += 1
    }
    new GenericArrayData(out)
  }
}
