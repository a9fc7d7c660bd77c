package graft.ops

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property check: [[GraphOps.connectedComponents]] equals a
  * sequential union-find on arbitrary random graphs — vertices
  * sampled sparsely (so ids are non-contiguous), edge lists with
  * duplicates, self-loops and both orientations. */
class GraphOpsPropSpec extends SparkSpec {
  import spark.implicits._

  private def unionFind(vs: Seq[Long], es: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(vs.map(v => v -> v): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    vs.map(v => v -> find(v)).toMap
  }

  private val graphGen = for {
    n <- Gen.choose(1, 30)
    vs <- Gen.pick(n, 0L until 100L)
    es <- Gen.listOfN(n, Gen.zip(Gen.oneOf(vs), Gen.oneOf(vs)))
  } yield (vs.toSeq.sorted, es)

  test("connectedComponents == sequential union-find on random graphs") {
    val prop = Prop.forAllNoShrink(graphGen) { case (vs, es) =>
      val edges = es.filter { case (a, b) => a != b }
      val got = GraphOps.connectedComponents(
          vs.toDF("id"), edges.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == unionFind(vs, edges)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("join-path frontier (broadcastLimit=0) matches the broadcast path") {
    // the at-scale message path: every round's frontier goes through
    // the co-partitioned edge join instead of the small-side
    // broadcast. Force it on a long-chain + dense-cluster mix (chains
    // exercise multi-round frontiers, the clique exercises fan-in)
    // and pin equality with the default (broadcast) run and with the
    // sequential union-find.
    val vs = (0L until 400L)
    val chain = (0L until 199L).map(i => (i, i + 1))          // one 200-hop chain
    val clique = for { a <- 200L until 230L; b <- (a + 1) until 230L } yield (a, b)
    val pairs = (230L until 400L by 2).map(i => (i, i + 1))
    val es = chain ++ clique ++ pairs
    val expect = unionFind(vs, es)
    val viaJoin = GraphOps.connectedComponents(
        vs.toDF("id"), es.toDF("src", "dst"), broadcastLimit = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaBcast = GraphOps.connectedComponents(
        vs.toDF("id"), es.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaJoin == expect, "join-path mismatch")
    assert(viaBcast == expect, "broadcast-path mismatch")
  }
}
