package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property check for [[PlanOps.keyPhaseOrder]] on random definition
  * chains: whatever permutation the scheduler picks, every def must
  * come after (a) the latest earlier definition of each name it
  * reads, (b) every earlier reader of a name it redefines, and
  * (c) any earlier definition of its own name — and the output must
  * be a permutation of the input. Chains mix scalar defs, stock- and
  * day-keyed windows, reads of base columns, and occasional
  * redefinitions, exercising shapes the hand-written Alpha101 chain
  * never hits. */
class PlanOpsPropSpec extends SparkSpec {

  private val wStock = Window.partitionBy("stock").orderBy("day")
  private val wDay = Window.partitionBy("day")

  /** Build a random chain of n defs over base columns x/y. Each def
    * reads 0-2 previously available names and is scalar / stock /
    * day keyed; ~1 in 6 redefines an existing name. */
  private def chainGen: Gen[Seq[(String, Column)]] = for {
    n <- Gen.choose(3, 18)
    kinds <- Gen.listOfN(n, Gen.choose(0, 2))
    readCounts <- Gen.listOfN(n, Gen.choose(0, 2))
    redefs <- Gen.listOfN(n, Gen.frequency(5 -> false, 1 -> true))
    seeds <- Gen.listOfN(n, Gen.choose(0, Int.MaxValue))
  } yield {
    val defs = Vector.newBuilder[(String, Column)]
    var avail = Vector("x", "y")
    (0 until n).foreach { i =>
      val rnd = new scala.util.Random(seeds(i))
      val reads = Seq.fill(readCounts(i))(avail(rnd.nextInt(avail.size)))
      val base = reads.foldLeft(lit(1.0): Column)((c, r) => c + col(r))
      val expr = kinds(i) match {
        case 0 => base
        case 1 => sum(base).over(wStock.rowsBetween(-2, 0))
        case _ => sum(base).over(wDay)
      }
      val name =
        if (redefs(i) && avail.size > 2) avail(2 + rnd.nextInt(avail.size - 2))
        else s"c$i"
      defs += (name -> expr)
      if (!avail.contains(name)) avail :+= name
    }
    defs.result()
  }

  private def refs(c: Column): Set[String] =
    org.apache.spark.sql.graftbridge.ColumnBridge.referencedNames(c)

  test("keyPhaseOrder respects all dependency edges on random chains") {
    val prop = Prop.forAllNoShrink(chainGen) { defs =>
      val out = PlanOps.keyPhaseOrder(defs)
      // permutation of the SAME tuple instances (two defs can be
      // value-equal, so compare and key by reference identity)
      val sameElems = out.map(System.identityHashCode(_)).sorted ==
        defs.map(System.identityHashCode(_)).sorted
      // rebuild the edges exactly as the scheduler defines them and
      // verify every edge is respected in the emitted order
      val posOf = new java.util.IdentityHashMap[(String, Column), Integer]()
      out.zipWithIndex.foreach { case (d, i) => posOf.put(d, i) }
      var ok = sameElems
      val lastDef = scala.collection.mutable.Map.empty[String, (String, Column)]
      val readers = scala.collection.mutable.Map.empty[String, List[(String, Column)]]
      def pos(d: (String, Column)): Int = posOf.get(d)
      defs.foreach { d =>
        val (name, c) = d
        refs(c).foreach { r =>
          lastDef.get(r).foreach(j => ok &&= pos(j) < pos(d))
          readers(r) = d :: readers.getOrElse(r, Nil)
        }
        readers.getOrElse(name, Nil).foreach(j =>
          if (j ne d) ok &&= pos(j) < pos(d))
        lastDef.get(name).foreach(j => ok &&= pos(j) < pos(d))
        lastDef(name) = d
      }
      ok
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(50), prop)
    assert(res.passed, res.status.toString)
  }
}
