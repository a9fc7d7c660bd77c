package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** The codegen'd dot kernel must be BIT-EXACT vs the interpreted
  * aggregate/zip_with HOF it replaced — same ascending-index
  * association — or every ANN/LSH oracle hash would shift. */
class VectorFnsSpec extends SparkSpec {
  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  test("DoubleVecDot == interpreted HOF dot, bitwise") {
    val vecGen = Gen.listOfN(64, Gen.chooseNum(-1e3, 1e3))
    val prop = Prop.forAllNoShrink(Gen.listOfN(20, Gen.zip(vecGen, vecGen))) { pairs =>
      val df = pairs.toDF("a", "b")
      val rows = df.select(
          VectorFns.dot(col("a"), col("b")).as("native"),
          hofDot(col("a"), col("b")).as("hof"))
        .collect()
      rows.forall { r =>
        java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1))
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("cosine of identical vectors is 1; orthogonal is 0; zero norm is null") {
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 3.0)),
      (Seq(1.0, 0.0, 0.0), Seq(0.0, 5.0, 0.0)),
      (Seq(0.0, 0.0, 0.0), Seq(1.0, 1.0, 1.0))).toDF("a", "b")
    val got = df.select(round(VectorFns.cosine(col("a"), col("b")), 9)).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq == Seq(Some(1.0), Some(0.0), None))
  }
}
