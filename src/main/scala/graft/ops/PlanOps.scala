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
    val ordered =
      if (sys.env.get("GRAFT_SCHED").contains("greedy")) defs else keyPhaseOrder(defs)
    val batches = Vector.newBuilder[ListMap[String, Column]]
    var cur = ListMap.empty[String, Column]
    ordered.foreach { case (name, c) =>
      if (cur.contains(name) || refs(c).exists(cur.contains)
          || (cap > 0 && cur.size >= cap)) {
        batches += cur; cur = ListMap(name -> c)
      } else cur = cur + (name -> c)
    }
    if (cur.nonEmpty) batches += cur
    batches.result().foldLeft(df)((d, b) => d.withColumns(b))
  }

  /** Key-phase scheduling (the default; GRAFT_SCHED=greedy restores
    * source order): permute definitions so window definitions with
    * the same partition key cluster into contiguous phases — each
    * stock↔day key flip in the layer sequence is one full-frame
    * Exchange, and the hand-written TS/XS stage alternation flips
    * more often than the dependency structure forces. On the full
    * alpha corpus at sf0.1 this cuts the physical plan from 21
    * exchanges (11 stock + 10 day) to 8, cold execution 158→97 s and
    * warm 65→44 s (same 32-def batching cap, same results — pinned
    * by the hash-exact Alpha101Spec goldens and the q90 oracle). At
    * cluster scale the win is direct: 13 fewer shuffles of the
    * progressively widening panel. Correctness-preserving: a
    * definition is only emitted after (a) every definition it reads,
    * (b) every EARLIER READER of a name it redefines
    * (anti-dependency — e.g. `vwap` is redefined in stage 0), and
    * (c) any earlier definition of its own name. Scheduling is
    * Kahn's algorithm with a phase preference: emit every ready
    * scalar or current-key definition, flip the key only when
    * starved. Deterministic (original order breaks ties). */
  private[ops] def keyPhaseOrder(defs: Seq[(String, Column)]): Seq[(String, Column)] = {
    val n = defs.size
    val idx = defs.indices
    val name = defs.map(_._1).toArray
    val refsOf = defs.map { case (_, c) => refs(c) }.toArray
    def kindOf(c: Column): Int = {
      val keys = org.apache.spark.sql.graftbridge.ColumnBridge.windowPartitionKeys(c)
      if (keys.isEmpty) 0 // free
      else {
        val heads = keys.map(_.headOption.getOrElse("")).toSet
        if (heads == Set("stock")) 1
        else if (!heads.contains("stock")) 2 // day / (day, industry)
        else 3 // mixed: forces both exchanges wherever it lands
      }
    }
    val kind = defs.map { case (_, c) => kindOf(c) }.toArray
    // dependency edges j -> i (j must precede i)
    val deps = Array.fill(n)(Set.newBuilder[Int])
    val lastDef = scala.collection.mutable.Map.empty[String, Int]
    val readers = scala.collection.mutable.Map.empty[String, List[Int]]
    idx.foreach { i =>
      refsOf(i).foreach { r =>
        lastDef.get(r).foreach(j => deps(i) += j)
        readers(r) = i :: readers.getOrElse(r, Nil)
      }
      // anti-dep: earlier readers of the name this def (re)defines,
      // plus the previous definition of the same name
      readers.getOrElse(name(i), Nil).foreach(j => if (j != i) deps(i) += j)
      lastDef.get(name(i)).foreach(j => deps(i) += j)
      lastDef(name(i)) = i
    }
    val dep = deps.map(_.result())
    val emitted = new Array[Boolean](n)
    val out = Vector.newBuilder[(String, Column)]
    var phase = 1 // start stock-side: stage 0 is lag/delta heavy
    var done = 0
    while (done < n) {
      var progressed = true
      while (progressed) {
        progressed = false
        idx.foreach { i =>
          if (!emitted(i) && (kind(i) == 0 || kind(i) == phase)
              && dep(i).forall(emitted)) {
            out += defs(i); emitted(i) = true; done += 1; progressed = true
          }
        }
      }
      if (done < n) {
        // starved: flip phase; if neither keyed phase can run, fall
        // back to emitting the first ready def of any kind (mixed)
        val alt = if (phase == 1) 2 else 1
        val canAlt = idx.exists(i => !emitted(i) && (kind(i) == 0 || kind(i) == alt)
          && dep(i).forall(emitted))
        if (canAlt) phase = alt
        else idx.find(i => !emitted(i) && dep(i).forall(emitted)) match {
          case Some(i) => out += defs(i); emitted(i) = true; done += 1
          case None => throw new IllegalStateException(
            "keyPhaseOrder: dependency cycle among column definitions")
        }
      }
    }
    out.result()
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
