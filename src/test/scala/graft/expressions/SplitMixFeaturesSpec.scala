package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** [[SplitMixFeatures]] — the q54 feature kernel on the expression
  * path. Interpreted eval and generated code share ONE static
  * `compute`, and both must agree with the raw kernel bit-for-bit
  * (the q54 DuckDB oracle replays exactly that arithmetic). */
class SplitMixFeaturesSpec extends SparkSpec {
  import spark.implicits._

  private def viaDf(payloads: Seq[Array[Byte]], dim: Int): Seq[Seq[Float]] =
    payloads.map(Tuple1(_)).toDF("p")
      .select(ColumnBridge.column(
        SplitMixFeatures(ColumnBridge.expression(col("p")), dim)).as("f"))
      .collect().toSeq.map(_.getSeq[Float](0))

  private def interpreted(payload: Array[Byte], dim: Int): Seq[Float] =
    SplitMixFeatures(Literal(payload, BinaryType), dim).eval(null)
      .asInstanceOf[ArrayData].toFloatArray().toSeq

  test("codegen path == interpreted eval == raw kernel, bitwise") {
    val rnd = new scala.util.Random(7)
    val payloads = Seq(Array.emptyByteArray, "a".getBytes, "hello world".getBytes) ++
      Seq.fill(10)(Array.fill(rnd.nextInt(200) + 1)(rnd.nextInt.toByte))
    val df = viaDf(payloads, 16)
    payloads.lazyZip(df).foreach { (p, got) =>
      val kernel = SplitMixFeatures.kernel(p, 16).toSeq
      assert(got == kernel, s"codegen != kernel for ${p.toSeq}")
      assert(interpreted(p, 16) == kernel, s"interpreted != kernel for ${p.toSeq}")
    }
  }

  test("deterministic, dim-sized, payload-sensitive, in (-1, 1)") {
    val a = SplitMixFeatures.kernel("hello".getBytes, 16)
    val b = SplitMixFeatures.kernel("hello".getBytes, 16)
    val c = SplitMixFeatures.kernel("other".getBytes, 16)
    assert(a.length == 16 && a.sameElements(b) && !a.sameElements(c))
    assert(a.forall(f => f >= -1.0f && f <= 1.0f))
  }

  test("null payload yields null, not an exception") {
    val r = Seq(Tuple1(null: Array[Byte])).toDF("p")
      .select(ColumnBridge.column(
        SplitMixFeatures(ColumnBridge.expression(col("p")), 8)).as("f"))
      .head()
    assert(r.isNullAt(0))
    assert(SplitMixFeatures(Literal(null, BinaryType), 8).eval(null) == null)
  }
}
