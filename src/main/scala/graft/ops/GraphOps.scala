package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed graph kernels for corpus curation. The one consumer
  * today is duplicate-cluster resolution: LSH/Jaccard candidate pairs
  * are edges, and the surviving document per near-duplicate cluster
  * is the component minimum (the standard "keep lowest doc_id"
  * convention in dedup pipelines; reference exposes only pairwise
  * candidates — see `Project report.md` dedup discussion — so cluster
  * resolution is part of the beyond-reference training-data tier).
  */
object GraphOps {

  /** Connected components by min-label propagation with pointer
    * jumping (label doubling), the shuffle-bounded formulation of
    * Kiveris et al.'s "Connected Components in MapReduce" family.
    *
    * Per iteration:
    *   1. neighbor-min: `comp(v) ← min(comp(v), min over edges (v,u)
    *      of comp(u))` — one shuffle join edges⋈labels + one
    *      aggregation;
    *   2. pointer jump: `comp(v) ← comp(comp(v))` — one labels⋈labels
    *      join. Labels are always real vertex ids (start at `id`,
    *      move only via min), so the lookup is total.
    *
    * Labels decrease monotonically and are bounded below by the
    * component minimum, so the fixpoint is exactly "smallest id in my
    * component"; with pointer jumping convergence is O(log n)
    * iterations rather than O(diameter) — the property that makes the
    * loop viable on 100 TB corpora where duplicate chains (A~B~C~…)
    * can be long. Each generation of labels is materialized with
    * `localCheckpoint(eager = true)`: the per-iteration self-join
    * would otherwise DOUBLE the logical plan every round (a 200-hop
    * chain OOMs the driver just *printing* the plan), so lineage
    * must be cut, not merely cached. On a real cluster swap in
    * reliable `checkpoint()` (HDFS/object-store) — same contract,
    * executor-loss tolerant.
    *
    * @param vertices single column `id`
    * @param edges    columns `src`, `dst`; either orientation,
    *                 parallel edges tolerated
    * @return columns `id`, `comp` (= min vertex id of the component)
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
                          maxIter: Int = 64): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    var lab = vertices.select(col("id"), col("id").as("comp"))
      .localCheckpoint()
    var changed = -1L
    var iter = 0
    while (changed != 0 && iter < maxIter) {
      val nbrMin = sym
        .join(lab.select(col("id").as("dst"), col("comp").as("ncomp")), "dst")
        .groupBy(col("src").as("id"))
        .agg(min("ncomp").as("nmin"))
      val stepped = lab.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nmin"), col("comp"))).as("comp"),
          col("comp").as("prev"))
      val jumped = stepped
        .join(stepped.select(col("id").as("jid"), col("comp").as("jcomp")),
          col("comp") === col("jid"))
        .select(col("id"), col("jcomp").as("comp"), col("prev"))
        .localCheckpoint() // eager: cuts the plan-doubling self-join lineage
      changed = jumped.filter(col("comp") =!= col("prev")).count()
      lab = jumped.select("id", "comp")
      iter += 1
    }
    sym.unpersist(blocking = false)
    require(changed == 0,
      s"connectedComponents did not converge in $maxIter iterations")
    lab.select("id", "comp")
  }
}
