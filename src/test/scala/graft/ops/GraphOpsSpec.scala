package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the connected-components fixpoint ([[GraphOps]]): component
  * label = smallest vertex id, singletons self-labeled, convergence
  * independent of edge orientation, and O(log n) pointer-jumping
  * actually closing long chains within the iteration bound. */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private def comps(vs: Seq[Long], es: Seq[(Long, Long)]): Map[Long, Long] =
    GraphOps.connectedComponents(
        vs.toDF("id"), es.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain, star, singleton and orientation-mixed edges") {
    //  chain 1-2-3-4, star 10<-{11,12}, singleton 20; reversed edge 4->3
    val out = comps(
      Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L),
      Seq((2L, 1L), (2L, 3L), (4L, 3L), (11L, 10L), (10L, 12L)))
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L))
  }

  test("long path converges under the iteration cap (pointer jumping)") {
    // a 200-vertex path: min-only propagation would need ~200 rounds,
    // far over maxIter=64 — pointer jumping must close it in O(log n)
    val n = 200L
    val out = comps(1L to n, (1L until n).map(i => (i, i + 1)))
    assert(out.size == n && out.values.forall(_ == 1L))
  }

  test("parallel and duplicate edges don't change the fixpoint") {
    val out = comps(Seq(1L, 2L, 3L),
      Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L)))
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }
}
