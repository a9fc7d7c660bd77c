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

  test("LongVecFold == interpreted HOF dot and sqdist, exactly") {
    val hofLongDot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)
    val hofSqDist = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), (acc, v) => acc + v)
    // micro-unit magnitudes (the q137/q138 range) at dim 64
    val vecGen = Gen.listOfN(64, Gen.chooseNum(-1000000L, 1000000L))
    val prop = Prop.forAllNoShrink(Gen.listOfN(20, Gen.zip(vecGen, vecGen))) { pairs =>
      val df = pairs.toDF("a", "b")
      df.select(
          VectorFns.longDot(col("a"), col("b")).as("nd"),
          hofLongDot(col("a"), col("b")).as("hd"),
          VectorFns.longSqDist(col("a"), col("b")).as("ns"),
          hofSqDist(col("a"), col("b")).as("hs"))
        .collect()
        .forall(r => r.getLong(0) == r.getLong(1) && r.getLong(2) == r.getLong(3))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("LongVecFold nulls on null elements and unequal lengths, like the HOF") {
    // aggregate(zip_with(...)) yields NULL when any product is null
    // (null element) or zip_with null-pads (length mismatch); the
    // codegen kernel must agree so a ranking consumer sorts such
    // rows last instead of ranking a silently-wrong sum
    val rows = Seq(
      (Seq[java.lang.Long](1L, null, 3L), Seq[java.lang.Long](1L, 2L, 3L)),
      (Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](1L, 2L, 3L)),
      (Seq[java.lang.Long](1L, 2L, 3L), Seq[java.lang.Long](4L, 5L, 6L)))
    val out = rows.toDF("a", "b").select(
      VectorFns.longDot(col("a"), col("b")).as("nd"),
      VectorFns.longSqDist(col("a"), col("b")).as("ns")).collect()
    assert(out(0).isNullAt(0) && out(0).isNullAt(1))
    assert(out(1).isNullAt(0) && out(1).isNullAt(1))
    assert(out(2).getLong(0) == 32L && out(2).getLong(1) == 27L)
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

  test("int8 quantizer edges: all-zero, NaN max-guard, ±max asymmetry") {
    val df = Seq(
      Seq(0.0, 0.0, 0.0),              // all-zero: guard -> zeros
      Seq(1.0, Double.NaN, 2.0),       // NaN max: guard false -> zeros
      Seq(-3.0, 1.5, 3.0),             // symmetric extremes hit ±127
      Seq(-4.0, 1.0)                   // max from the NEGATIVE side
    ).toDF("v")
    val got = df.select(VectorFns.int8Quantize(col("v"))).collect()
      .map(_.getSeq[Long](0))
    assert(got(0) == Seq(0L, 0L, 0L))
    assert(got(1) == Seq(0L, 0L, 0L))
    // scale 127/3: floor(-127 + .5) = -127, floor(63.5 + .5) = 64
    assert(got(2) == Seq(-127L, 64L, 127L))
    // scale 127/4: -4 -> floor(-126.5) = -127, 1 -> floor(32.25) = 32
    assert(got(3) == Seq(-127L, 32L))
  }

  test("int8 quantizer: invariant under power-of-two vector scaling") {
    // scale = 127/max|x| normalizes the vector's magnitude away; for
    // power-of-two scalings every intermediate (c·x, scale/c) is an
    // exact float op, so the quantized vector — and hence the q121
    // integer ranking key — is BIT-identical. (Non-power-of-two
    // scalings are invariant up to one ulp of the pre-floor product;
    // the pinned guarantee is the exact one.)
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-1e4, 1e4))
    val cGen = Gen.oneOf(0.5, 0.25, 4.0, 1024.0, math.pow(2, -20), math.pow(2, 40))
    val qGen = Gen.listOfN(16, Gen.chooseNum(-1e2, 1e2))
    val prop = Prop.forAllNoShrink(Gen.listOfN(8, Gen.zip(vecGen, cGen, qGen))) { rows =>
      val df = rows.map { case (v, c, q) => (v, v.map(_ * c), q) }
        .toDF("v", "vc", "q")
      val out = df.select(
          VectorFns.int8Quantize(col("v")).as("qa"),
          VectorFns.int8Quantize(col("vc")).as("qb"),
          VectorFns.int8Dot(VectorFns.int8Quantize(col("v")),
            VectorFns.int8Quantize(col("q"))).as("d1"),
          VectorFns.int8Dot(VectorFns.int8Quantize(col("vc")),
            VectorFns.int8Quantize(col("q"))).as("d2"))
        .collect()
      out.forall(r => r.getSeq[Long](0) == r.getSeq[Long](1)
        && r.getLong(2) == r.getLong(3))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
