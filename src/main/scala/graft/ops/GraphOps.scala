package graft.ops

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StructField, StructType}
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
    * Contract is Dataset-in/Dataset-out; the LOOP runs as a Pregel-
    * style RDD kernel. This is the one shape where the DataFrame
    * formulation measurably loses: an iterative fixed point re-enters
    * Catalyst every round (analysis + optimization + AQE re-planning
    * + broadcast builds were ~0.45 s/round at sf0.1 — constant in
    * data size, pure latency), the loop's two-long-column frames get
    * nothing back from codegen or pushdown, and fusing rounds into
    * one plan blows the self-join subtree up exponentially (measured
    * 21 s at 3 fused rounds vs 4.5 s unfused). GraphX draws the same
    * boundary for the same reason. The kernel keeps every scale
    * property the SQL loop had, plus two it lacked:
    *
    *  - PARTITIONER SIZED BY DATA: labels and edges are hash-
    *    partitioned once into `max(n,m)/1e6` partitions (clamped to
    *    [1, defaultParallelism]); every per-round join is then
    *    co-partitioned and narrow. A 5k-vertex local run collapses to
    *    single-task rounds; a 10^10-vertex corpus gets full-cluster
    *    width.
    *  - FRONTIER PROPAGATION: only vertices whose label changed last
    *    round send messages (a vertex's neighbor-min can only change
    *    if a neighbor's label did), so message volume tracks the
    *    shrinking per-round delta instead of staying O(|E|). Small
    *    frontiers (≤ [[FrontierBroadcastRows]]) are broadcast as a
    *    hash map — the same collect-the-small-side move as a SQL
    *    broadcast join — turning late rounds into shuffle-free edge
    *    scans; large frontiers use the co-partitioned join. The
    *    static edge-partition scan per round remains, as in every
    *    Pregel-family engine.
    *  - SKEW-FREE POINTER JUMP: the jump reads comp(label), so keying
    *    the vertex set by its label would send a converged giant
    *    component's whole membership to one partition (single-task
    *    straggler in late rounds). Instead each round derives the
    *    LIVE-LABEL jump map (map-side-combined distinct → unique-
    *    keyed lookup, one row per label, non-trivial entries only);
    *    it shrinks toward #components, so in exactly the regime where
    *    the skew would bite it broadcasts and the jump becomes a
    *    shuffle-free mapValues. The label-keyed join survives only as
    *    the early-round fallback, where labels are still diverse and
    *    per-label groups small.
    *
    * Per round: neighbor-min `comp(v) ← min(comp(v), min over edges
    * (v,u), u in frontier, of comp(u))`, then pointer jump
    * `comp(v) ← comp(comp(v))` (labels are always real vertex ids —
    * start at `id`, move only via min — so the lookup is total).
    * Labels decrease monotonically and are bounded below by the
    * component minimum, so the fixpoint is exactly "smallest id in my
    * component"; with pointer jumping convergence is O(log n) rounds
    * rather than O(diameter) — the property that makes the loop
    * viable on 100 TB corpora where duplicate chains (A~B~C~…) can be
    * long. Convergence = empty frontier (no label changed), counted
    * by an accumulator that fills during the round's one
    * materializing job; a task retry could overcount it, which costs
    * at most one extra (idempotent) round — the ==0 read is exact.
    *
    * Each generation of labels is materialized with
    * `localCheckpoint` + count: the per-round self-join would
    * otherwise DOUBLE the lineage every round (a 200-hop chain OOMs
    * the driver just *printing* the plan), so lineage must be cut,
    * not merely cached. On a real cluster swap in reliable
    * `checkpoint()` (HDFS/object-store) — same contract,
    * executor-loss tolerant.
    *
    * Ids must be integral (byte/short/int/long) and non-null; output
    * is cast back to the input id type.
    *
    * @param vertices single column `id`
    * @param edges    columns `src`, `dst`; either orientation,
    *                 parallel edges tolerated
    * @return columns `id`, `comp` (= min vertex id of the component)
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
                          maxIter: Int = 64,
                          broadcastLimit: Long = FrontierBroadcastRows): DataFrame = {
    val spark = vertices.sparkSession
    val sc = spark.sparkContext
    val idType = vertices.schema("id").dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"connectedComponents needs an integral id column, got $idType " +
        "(hash non-integral ids to long upstream)")

    // symmetrize + distinct on the SQL side (codegen'd, columnar);
    // the kernel sees one narrow conversion of the final edge set
    val symDf = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .union(edges.select(col("dst").cast("long").as("src"),
        col("src").cast("long").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val m = symDf.count()
    val n = vertices.count()
    val p = math.max(1, math.min(sc.defaultParallelism,
      math.ceil(math.max(n, m) / 1e6).toInt))
    val part = new HashPartitioner(p)
    // keyed by dst: each row is "dst's label is visible to src"
    val sym: RDD[(Long, Long)] = symDf
      .select(col("dst"), col("src")).rdd
      .map(r => (r.getLong(0), r.getLong(1)))
      .partitionBy(part)
      .persist(StorageLevel.MEMORY_AND_DISK)
    sym.count()
    symDf.unpersist(blocking = false)

    var lab: RDD[(Long, Long)] = vertices.select(col("id").cast("long")).rdd
      .map { r => val id = r.getLong(0); (id, id) }
      .partitionBy(part)
      .persist(StorageLevel.MEMORY_AND_DISK)
    lab.count()
    var frontier: RDD[(Long, Long)] = lab
    var frontierSize = n
    var prevGen: RDD[_] = lab
    var iter = 0
    while (frontierSize > 0 && iter < maxIter) {
      // round-scoped broadcasts, executor copies released once jumped
      // materializes: tens of rounds near the limit would otherwise
      // pin maps in the block manager until GC, during exactly the
      // late rounds the persisted stepped/jumped generations also
      // occupy. unpersist, NOT destroy: the mapValues closures live
      // on inside the checkpointed RDDs and still SERIALIZE the
      // broadcast handle with later tasks (never re-evaluated, but a
      // destroyed handle throws at serialization — measured as
      // Task-not-serializable on the next round's collectAsMap)
      var roundBcs = List.empty[org.apache.spark.broadcast.Broadcast[_]]
      val msgs: RDD[(Long, Long)] =
        if (frontierSize <= broadcastLimit) {
          // broadcast-build of the small side, exactly as a SQL
          // broadcast join would: shuffle-free edge scan this round
          val fm = sc.broadcast(frontier.collectAsMap())
          roundBcs ::= fm
          sym.flatMap { case (dst, src) => fm.value.get(dst).map(c => (src, c)) }
        } else sym.join(frontier).map { case (_, (src, c)) => (src, c) }
      val nbrMin = msgs.reduceByKey(part, (a: Long, b: Long) => math.min(a, b))
      // (id -> (newComp, oldComp)); co-partitioned, narrow. Persisted
      // because it feeds both the jump-map derivation and the final
      // jump pass of the round.
      val stepped = lab.leftOuterJoin(nbrMin, part).mapValues {
        case (c, nm) => (math.min(c, nm.getOrElse(c)), c)
      }.persist(StorageLevel.MEMORY_AND_DISK)
      val newOnly = stepped.mapValues(_._1)
      // JUMP MAP: comp(x) for every x that is currently in use as a
      // label, restricted to the non-trivial entries (comp(x) != x).
      // Derived via map-side-combined distinct (shuffle volume =
      // per-partition-distinct labels, one row per label after), then
      // a unique-keyed lookup join. Bounded by the number of LIVE
      // labels, which shrinks toward #components as the fixpoint
      // converges — precisely the regime where keying the full vertex
      // set by its label (the r11 formulation) collapses a giant
      // component's members onto one straggler partition (round-11
      // advice). Small maps broadcast, making the jump a shuffle-free
      // mapValues; the join fallback only runs while labels are still
      // diverse (early rounds), where per-label groups are small.
      val jump = newOnly.map(kv => (kv._2, ())).reduceByKey(part, (a, _) => a)
        .join(newOnly, part)
        .flatMap { case (x, (_, c)) => if (c != x) Some((x, c)) else None }
        .persist(StorageLevel.MEMORY_AND_DISK) // count + (collect | join) both read it
      val acc = sc.longAccumulator(s"cc_frontier_$iter")
      val jumped = (if (jump.count() <= broadcastLimit) {
        val jm = sc.broadcast(jump.collectAsMap())
        roundBcs ::= jm
        // mapValues keeps the partitioner: zero shuffle, zero skew
        stepped.mapValues { case (nc, oc) =>
          val jc = jm.value.getOrElse(nc, nc)
          if (jc != oc) acc.add(1L)
          (jc, jc != oc)
        }
      } else {
        stepped
          .map { case (v, (nc, oc)) => (nc, (v, oc)) }
          .leftOuterJoin(jump, part)
          .map { case (nc, ((v, oc), j)) =>
            val jc = j.getOrElse(nc)
            if (jc != oc) acc.add(1L)
            (v, (jc, jc != oc))
          }
          .partitionBy(part)
      }).persist(StorageLevel.MEMORY_AND_DISK)
      jumped.localCheckpoint() // lineage cut; materialized by the count below
      jumped.count()
      roundBcs.foreach(_.unpersist(false))
      jump.unpersist(blocking = false)
      stepped.unpersist(blocking = false)
      prevGen.unpersist(blocking = false)
      prevGen = jumped
      lab = jumped.mapValues(_._1)
      frontier = jumped.filter(_._2._2).mapValues(_._1)
      frontierSize = acc.value
      iter += 1
    }
    sym.unpersist(blocking = false)
    require(frontierSize == 0,
      s"connectedComponents did not converge in $maxIter rounds")
    val out = spark.createDataFrame(
      lab.map { case (id, comp) => Row(id, comp) },
      StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("comp", LongType, nullable = false))))
    out.select(col("id").cast(idType).as("id"), col("comp").cast(idType).as("comp"))
  }

  /** Frontier rows at or below this are broadcast to the edge scan
    * instead of joined (≈1.6 MB of (long, long) pairs at the default;
    * the same small-side threshold reasoning as a broadcast join). */
  val FrontierBroadcastRows: Long = 100000L
}
