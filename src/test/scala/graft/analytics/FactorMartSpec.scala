package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the factor MART lossless (r16: the alpha panel is computed
  * once and STORED as year-partitioned sorted parquet; q58/q90/q91
  * read the mart — the reference's materialized factor-plane shape).
  * The pin the r15 verdict asked for: a consumer reading the mart
  * must be HASH-IDENTICAL to one reading the derive frame. Parquet
  * stores doubles as raw IEEE-754 bits (the q148 sink-proof), so the
  * comparison is bit-for-bit over every (stock, day) row and every
  * one of the 104 columns — which subsumes q90 and q91 at once: both
  * are deterministic functions of exactly this frame. */
class FactorMartSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("mart read is bit-identical to a scratch derive, all columns") {
    val mart = FactorQueries.alphaFull(spark, dir)
    // the scratch derive: the same DAG the mart build ran, minus the
    // parquet sink — a fresh plan, no memo in the way
    val full = graft.factors.Alpha101.compute(
      graft.sources.Quotes.panel(spark, dir))
    val keep = Seq("stock", "day", "close") ++
      full.schema.fieldNames.filter(_.startsWith("alpha_"))
    assert(mart.schema.fieldNames.toSeq == keep,
      "mart schema must be (stock, day, close, alpha_*) in derive order")
    val derive = full.select(keep.map(col): _*)

    val a = mart.orderBy("stock", "day").collect()
    val b = derive.orderBy("stock", "day").collect()
    assert(a.length == b.length && a.nonEmpty)
    val nCols = keep.length
    a.zip(b).foreach { case (ra, rb) =>
      var i = 0
      while (i < nCols) {
        val bitsA = if (ra.isNullAt(i)) null
          else ra.get(i) match {
            case d: Double => java.lang.Double.doubleToLongBits(d)
            case v => v
          }
        val bitsB = if (rb.isNullAt(i)) null
          else rb.get(i) match {
            case d: Double => java.lang.Double.doubleToLongBits(d)
            case v => v
          }
        assert(bitsA == bitsB,
          s"mart/derive divergence at stock=${ra.get(0)} day=${ra.get(1)} col=${keep(i)}")
        i += 1
      }
    }
  }

  test("persistent mart root: second session-build REUSES the completed write") {
    val root = java.nio.file.Files.createTempDirectory("graft_mart_root").toString
    FactorQueries.martRootOverride = Some(root)
    try {
      FactorQueries.dropAlphaMemo(spark, dir)
      val first = FactorQueries.alphaFull(spark, dir).count()
      val martDir = new java.io.File(s"$root/${new java.io.File(dir).getName}")
      assert(new java.io.File(martDir, "_SUCCESS").isFile)
      val stamps = martDir.listFiles().map(f => f.getName -> f.lastModified).toMap
      // drop the memo (a "new session" for the cache) and rebuild:
      // the completed mart must be REUSED — same files, untouched
      FactorQueries.dropAlphaMemo(spark, dir)
      val second = FactorQueries.alphaFull(spark, dir).count()
      assert(first == second)
      val after = martDir.listFiles().map(f => f.getName -> f.lastModified).toMap
      assert(after == stamps, "persistent mart was rewritten instead of reused")
    } finally {
      FactorQueries.martRootOverride = None
      FactorQueries.dropAlphaMemo(spark, dir)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
  }

  test("mart scan prunes columns at the parquet reader") {
    val mart = FactorQueries.alphaFull(spark, dir)
    val two = mart.select("stock", "alpha_001")
    val scan = two.queryExecution.executedPlan.toString
    // ReadSchema must carry only the selected columns — the cached
    // in-memory panel of r15 could never prune; the mart's point is
    // that a 2-of-104-column consumer reads 2 columns
    val read = scan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("alpha_001"), read)
    assert(!read.contains("alpha_002"), s"unpruned mart read: $read")
  }
}
