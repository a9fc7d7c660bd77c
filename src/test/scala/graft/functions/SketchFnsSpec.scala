package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[SketchFns.kmvMinK]] ([[graft.expressions.KmvMinK]]): bottom-k
  * distinct minima under duplication, partitioning (partial-buffer
  * serialize/merge), short inputs, nulls, and grouping. */
class SketchFnsSpec extends SparkSpec {
  import spark.implicits._

  private def sketch(values: Seq[java.lang.Long], k: Int,
                     parts: Int = 7): Seq[Long] =
    values.toDF("h").repartition(parts)
      .agg(SketchFns.kmvMinK(col("h"), k).as("m"))
      .head().getSeq[Long](0)

  test("kmvMinK keeps the k smallest distinct values, sorted") {
    val vals = scala.util.Random.shuffle(
      ((0L until 100L) ++ (0L until 100L)).toList) // every value twice
    assert(sketch(vals.map(java.lang.Long.valueOf), 16) === (0L until 16L))
  }

  test("kmvMinK with fewer distinct values than k is exhaustive") {
    val vals = Seq(42L, 7L, 42L, 99L, 7L).map(java.lang.Long.valueOf)
    assert(sketch(vals, 16) === Seq(7L, 42L, 99L))
  }

  test("kmvMinK ignores nulls") {
    val vals = Seq[java.lang.Long](5L, null, 3L, null, 9L)
    assert(sketch(vals, 2) === Seq(3L, 5L))
  }

  test("kmvMinK duplicate insert at full buffer does not evict") {
    // single partition so the update sequence is deterministic: the
    // second 5 hits a full buffer, is < last, but is already present —
    // TreeSet.add returns false and nothing may be evicted
    val vals = Seq(10L, 20L, 30L, 40L, 5L, 5L).map(java.lang.Long.valueOf)
    assert(sketch(vals, 4, parts = 1) === Seq(5L, 10L, 20L, 30L))
  }

  test("kmvMinK matches sort-distinct-take-k on random multisets") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 10) {
      val n = rnd.nextInt(400) + 1
      val vals = Seq.fill(n)(rnd.nextInt(120).toLong) // heavy duplication
      val k = rnd.nextInt(40) + 1
      val expect = vals.distinct.sorted.take(k)
      assert(sketch(vals.map(java.lang.Long.valueOf), k,
        parts = rnd.nextInt(8) + 1) === expect, s"trial=$trial n=$n k=$k")
    }
  }

  test("kmvMinK groups independently under groupBy") {
    val df = Seq(("a", 3L), ("a", 1L), ("a", 2L), ("b", 9L), ("b", 8L))
      .toDF("g", "h").repartition(5)
    val out = df.groupBy("g").agg(SketchFns.kmvMinK(col("h"), 2).as("m"))
      .orderBy("g").collect()
    assert(out.map(_.getSeq[Long](1)).toSeq === Seq(Seq(1L, 2L), Seq(8L, 9L)))
  }
}
