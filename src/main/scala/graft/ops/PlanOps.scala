package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

import scala.collection.immutable.ListMap

/** Plan-size control for wide derived-column pipelines.
  *
  * A chain of N `.withColumn` calls creates N nested Projects and —
  * because Dataset construction analyzes eagerly — costs N full
  * re-analyses of a growing plan: O(N²·cols) driver time. At the
  * Alpha101 pipeline's ~330 derived columns that was ~5 minutes of
  * pure planning per query BEFORE any data moved (round-5 bench:
  * q90/q58/q91 each ~490-730 s at sf0.1, almost all driver-side).
  *
  * [[withColumnsBatched]] folds consecutive definitions into one
  * `withColumns` projection per dependency layer: a new batch starts
  * only when a definition references (or redefines) a name created
  * earlier in the SAME batch. Analysis then runs once per layer
  * (~30 layers instead of ~330 chained projections), and each layer
  * is a single flat Project that Catalyst collapses cheaply.
  */
object PlanOps {

  /** Unresolved column names referenced by an expression tree
    * (window partition/order specs and lambda bodies included). */
  private def refs(c: Column): Set[String] =
    org.apache.spark.sql.graftbridge.ColumnBridge.referencedNames(c)

  /** Greedy CONTIGUOUS batching — measured better than true
    * topological layering, keep it. A/B on the full alpha corpus at
    * sf0.1 (same commit, only the schedule swapped): greedy 136 s vs
    * 234 s for BOTH as-early-as-possible and as-late-as-possible
    * topological schedules, despite near-identical Window-operator
    * counts (160 vs ~154). Mechanism: topological layers put ~150
    * definitions in ONE projection, and the analyzer extracts that
    * projection's window specs as one stack of adjacent Window
    * operators with no Project between them — every operator in the
    * stack then carries the full layer width. Greedy's many small
    * batches leave Project boundaries between window stacks where
    * ColumnPruning drops dead intermediates, so per-operator
    * projection codegen (the dominant cost, ~0.3 s/op) runs over
    * narrower schemas. */
  /** Max definitions per batch. Capping splits oversized greedy runs
    * at extra Project boundaries, giving ColumnPruning more places to
    * narrow schemas between window stacks. Swept on the full alpha
    * corpus at sf0.1 (isolated q90, same commit): uncapped 152.9 s,
    * cap 6 → 142.1, 10 → 124.5, 14 → 114.2, 20 → 106.1, 26 → 112.1,
    * 32 → 100.4/98.4 (repeated), 48 → 118.2. 32 is the measured
    * optimum; overridable via GRAFT_BATCH_CAP (0 = uncapped). */
  private val DefaultBatchCap = 32

  def withColumnsBatched(df: DataFrame, defs: Seq[(String, Column)]): DataFrame = {
    val cap = sys.env.get("GRAFT_BATCH_CAP").map(_.toInt).getOrElse(DefaultBatchCap)
    val batches = Vector.newBuilder[ListMap[String, Column]]
    var cur = ListMap.empty[String, Column]
    defs.foreach { case (name, c) =>
      if (cur.contains(name) || refs(c).exists(cur.contains)
          || (cap > 0 && cur.size >= cap)) {
        batches += cur; cur = ListMap(name -> c)
      } else cur = cur + (name -> c)
    }
    if (cur.nonEmpty) batches += cur
    batches.result().foldLeft(df)((d, b) => d.withColumns(b))
  }

  /** Drop-in deferred builder for long `.withColumn` chains: records
    * definitions without touching the plan, then [[build]] emits the
    * batched layers. Lets a 330-column pipeline keep its readable
    * one-column-per-line shape while paying analyzer cost per LAYER,
    * not per column. */
  final case class ColChain(df: DataFrame, defs: Vector[(String, Column)] = Vector.empty) {
    def withColumn(name: String, c: Column): ColChain = copy(defs = defs :+ (name -> c))
    def build: DataFrame = withColumnsBatched(df, defs)
  }
}
