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

  /** TRUE topological layering, not greedy contiguous batching: each
    * definition lands in `max(dep layers) + 1`, so definitions that
    * don't depend on each other share a layer regardless of their
    * position in the authored chain. This matters beyond analyzer
    * cost: the analyzer merges same-(partition, order) window
    * expressions of ONE projection into ONE Window operator, and the
    * per-operator execution overhead of a 300-column plan dominates
    * small-to-mid scale runs (measured: each Window/Sort operator
    * costs ~0.3 s per execution in projection code generation alone —
    * greedy batching left 160 window ops where the dependency
    * structure only needs ~half that, because the authored ts/xs
    * stage alternation scattered same-spec windows across batches).
    *
    * Redefinition of an existing name is ordered conservatively AFTER
    * every earlier layer (`maxLayer + 1`), which preserves sequential
    * read-old-then-redefine semantics (processing is in authored
    * order, so every earlier reader's layer <= maxLayer). */
  def withColumnsBatched(df: DataFrame, defs: Seq[(String, Column)]): DataFrame = {
    val layerOf = scala.collection.mutable.Map.empty[String, Int]
    var maxLayer = -1
    val layers = scala.collection.mutable.ArrayBuffer.empty[Vector[(String, Column)]]
    defs.foreach { case (name, c) =>
      val depLayers = refs(c).flatMap(layerOf.get)
      var layer = if (depLayers.isEmpty) 0 else depLayers.max + 1
      if (layerOf.contains(name)) layer = math.max(layer, maxLayer + 1)
      while (layers.size <= layer) layers += Vector.empty
      layers(layer) :+= (name -> c)
      layerOf(name) = layer
      maxLayer = math.max(maxLayer, layer)
    }
    if (sys.env.contains("GRAFT_PLAN_DEBUG"))
      println(s"PLANOPS layers=${layers.size} sizes=${layers.map(_.size).mkString(",")}")
    layers.foldLeft(df)((d, b) => d.withColumns(ListMap(b: _*)))
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
